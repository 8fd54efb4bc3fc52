from blah2_tpu.parallel.mesh import make_radar_mesh  # noqa: F401
from blah2_tpu.parallel.sharded import ShardedCpiPipeline  # noqa: F401
