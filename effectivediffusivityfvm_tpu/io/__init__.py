from . import images, writers
