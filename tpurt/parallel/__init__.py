from tpurt.parallel.mesh import make_mesh, mesh_info  # noqa: F401
from tpurt.parallel.shard import render_frame_sharded  # noqa: F401
