from . import fvm, flux
