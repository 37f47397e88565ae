from . import analysis, h5
