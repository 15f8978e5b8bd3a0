from tpurt.scene.builder import Material, MeshHandle, SceneBuilder  # noqa: F401
from tpurt.scene.types import MaterialType, Scene  # noqa: F401
