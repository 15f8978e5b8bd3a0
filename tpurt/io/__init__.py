from tpurt.io.bmp import read_bmp, write_bmp  # noqa: F401
from tpurt.io.checkpoint import TileAccumulator  # noqa: F401
