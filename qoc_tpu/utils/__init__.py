from . import analysis, checkpoint, h5, plotting, profiling, verification
