from tpurt.core import rng, vecmath  # noqa: F401
from tpurt.core.camera import Camera, make_camera_rays  # noqa: F401
