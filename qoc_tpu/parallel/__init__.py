from . import batch, mesh, pallas_batch, shard
