from . import batch, mesh
