from bm2f_tpu.parallel.mesh import batch_sharding, create_mesh, replicate

__all__ = ["create_mesh", "batch_sharding", "replicate"]
