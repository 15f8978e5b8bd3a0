"""BMP byte-format parity (src/math.hpp:117-164) and checkpoints."""

import numpy as np

from tpurt.config import RenderConfig
from tpurt.io.bmp import bmp_bytes, read_bmp, write_bmp
from tpurt.io.checkpoint import TileAccumulator


def _reference_bmp(pixels_rgba: np.ndarray) -> bytes:
    """Literal transcription of placeImageDataIntoBMP for the test:
    takes an RGBA8 buffer, drops alpha, bottom-up BGR rows, zero pad."""
    h, w = pixels_rgba.shape[:2]
    pad = (4 - (w * 3) % 4) % 4
    row = 3 * w + pad
    file_size = 54 + row * h
    header = bytearray(54)
    header[0:2] = b"BM"
    header[2] = file_size & 0xFF
    header[3] = (file_size >> 8) & 0xFF
    header[4] = (file_size >> 16) & 0xFF
    header[5] = (file_size >> 24) & 0xFF
    header[10] = 54
    header[14] = 40
    header[18] = w & 0xFF
    header[19] = (w >> 8) & 0xFF
    header[20] = (w >> 16) & 0xFF
    header[21] = (w >> 24) & 0xFF
    header[22] = h & 0xFF
    header[23] = (h >> 8) & 0xFF
    header[24] = (h >> 16) & 0xFF
    header[25] = (h >> 24) & 0xFF
    header[26] = 1
    header[28] = 24
    out = bytes(header)
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = pixels_rgba[y, x, 0], pixels_rgba[y, x, 1], pixels_rgba[y, x, 2]
            out += bytes([b, g, r])
        out += bytes(pad)
    return out


def test_bmp_bytes_match_reference_layout():
    rs = np.random.RandomState(0)
    for w, h in [(4, 4), (5, 3), (2, 7), (1, 1)]:  # varied row padding
        rgba = rs.randint(0, 256, (h, w, 4), dtype=np.uint8)
        assert bmp_bytes(rgba) == _reference_bmp(rgba)


def test_bmp_roundtrip(tmp_path):
    rs = np.random.RandomState(1)
    img = rs.randint(0, 256, (9, 7, 3), dtype=np.uint8)
    p = str(tmp_path / "x.bmp")
    write_bmp(p, img)
    np.testing.assert_array_equal(read_bmp(p), img)


def test_checkpoint_roundtrip_and_fingerprint(tmp_path):
    cfg = RenderConfig(width=16, height=16, tile_size=8)
    p = str(tmp_path / "acc.npz")
    acc = TileAccumulator(cfg, path=p)
    tile = np.full((8, 8, 3), 0.25, np.float32)
    acc.put_tile(0, 1, tile)
    acc2 = TileAccumulator(cfg, path=p)
    assert acc2.has_tile(0, 1)
    np.testing.assert_array_equal(acc2.get_tile(0, 1), tile)
    # Preview places the tile at the right offset.
    prev = acc2.preview()
    np.testing.assert_array_equal(prev[8:16, 0:8], tile)
    assert prev[0:8].sum() == 0
    # A different config refuses the stale data.
    acc3 = TileAccumulator(cfg.replace(rays_per_pixel=7), path=p)
    assert acc3.num_tiles == 0
