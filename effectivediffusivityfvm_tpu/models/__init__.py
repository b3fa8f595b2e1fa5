from . import phases, floodfill
