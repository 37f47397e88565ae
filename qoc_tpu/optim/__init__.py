from . import adam, convergence, lbfgs, scipy_bridge
