from tpurt.parallel.mesh import make_mesh, mesh_info, select_devices  # noqa: F401
from tpurt.parallel.shard import render_frame_sharded  # noqa: F401
