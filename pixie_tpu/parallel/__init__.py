from pixie_tpu.parallel.mesh import get_mesh, shard_batch
