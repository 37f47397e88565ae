from . import analysis, h5, verification
