from synchformer_tpu.parallel.mesh import make_mesh, batch_sharding, param_shardings  # noqa: F401
