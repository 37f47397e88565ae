from . import adam, convergence, scipy_bridge
