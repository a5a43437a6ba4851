"""Image file loading (scene/image_io.py) and real-asset fallback.

Mirrors /root/reference/scene/src/texture/loader.rs:9-87,
normal_texture.rs:16-67 (flip_y), float_texture.rs:16-55 (linearize),
environment_light.rs:165-215 (EXR equirect).
"""
import numpy as np
import pytest

from tpu_pathtracer.scene import image_io, mesh


@pytest.fixture
def png_rgb(tmp_path):
    from PIL import Image

    arr = np.zeros((4, 6, 3), np.uint8)
    arr[..., 0] = 255       # pure red
    arr[1, 1] = (0, 128, 0)
    p = tmp_path / "t.png"
    Image.fromarray(arr).save(p)
    return str(p), arr


def test_load_rgb_linearizes_srgb(png_rgb):
    path, arr = png_rgb
    img = image_io.load_rgb(path)
    assert img.shape == (4, 6, 3) and img.dtype == np.float32
    assert abs(img[0, 0, 0] - 1.0) < 1e-6          # 255 -> 1.0 (linear)
    # 128/255 sRGB-encoded -> ~0.2158 linear
    assert abs(img[1, 1, 1] - 0.2158) < 2e-3
    raw = image_io.load_rgb(path, linearize=False)
    assert abs(raw[1, 1, 1] - 128 / 255) < 1e-6


def test_load_gray_linearize_option(tmp_path):
    from PIL import Image

    arr = np.full((3, 3), 128, np.uint8)
    p = tmp_path / "g.png"
    Image.fromarray(arr, "L").save(p)
    raw = image_io.load_gray(str(p))
    lin = image_io.load_gray(str(p), linearize=True)
    assert abs(raw[0, 0] - 128 / 255) < 1e-6
    assert abs(lin[0, 0] - 0.2158) < 2e-3


def test_load_normal_flip_y(tmp_path):
    from PIL import Image

    # a normal tilted toward +Y: g > 0.5
    arr = np.zeros((2, 2, 3), np.uint8)
    arr[...] = (128, 200, 230)
    p = tmp_path / "n.png"
    Image.fromarray(arr).save(p)
    n = image_io.load_normal(str(p))
    nf = image_io.load_normal(str(p), flip_y=True)
    assert abs((n[0, 0, 1] * 2 - 1) + (nf[0, 0, 1] * 2 - 1)) < 1e-5
    assert np.allclose(n[..., 0], nf[..., 0])


def test_exr_round_trip(tmp_path):
    from tpu_pathtracer.utils import exr

    hdr = np.zeros((4, 8, 3), np.float32)
    hdr[..., 0] = 3.5     # R=3.5 — beyond LDR range
    hdr[2, 3] = (0.25, 7.0, 0.125)
    p = str(tmp_path / "e.exr")
    exr.write_exr(p, hdr)
    img = image_io.load_env(p)
    assert img.shape == (4, 8, 3)
    assert np.allclose(img, hdr)


def test_exr_zip_compressed_half(tmp_path):
    """Hand-build a ZIPS-compressed HALF EXR; the reader must invert the
    delta predictor + byte interleave (OpenEXR zip preprocessing)."""
    import struct
    import zlib

    from tpu_pathtracer.utils import exr

    h, w = 3, 5
    rng = np.random.default_rng(7)
    img = (rng.random((h, w, 3)) * 4.0).astype(np.float16)

    def attr(name, typ, data):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + struct.pack("<I", len(data)) + data)

    names = ["B", "G", "R"]  # alphabetical file order
    chlist = b"".join(
        n.encode() + b"\0" + struct.pack("<iBBBBii", 1, 0, 0, 0, 0, 1, 1)
        for n in names) + b"\0"
    box = struct.pack("<4i", 0, 0, w - 1, h - 1)
    header = (struct.pack("<ii", 20000630, 2)
              + attr("channels", "chlist", chlist)
              + attr("compression", "compression", bytes([2]))  # ZIPS
              + attr("dataWindow", "box2i", box)
              + attr("displayWindow", "box2i", box)
              + attr("lineOrder", "lineOrder", b"\0")
              + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
              + attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0))
              + attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
              + b"\0")
    chunks = []
    rgb_of = {"R": 0, "G": 1, "B": 2}
    for y in range(h):
        raw = b"".join(img[y, :, rgb_of[n]].tobytes() for n in names)
        comp = zlib.compress(exr._interleave_predict(raw))
        if len(comp) >= len(raw):  # spec: store raw if zip doesn't shrink
            comp = raw
        chunks.append(struct.pack("<iI", y, len(comp)) + comp)
    table_off = len(header)
    data_off = table_off + 8 * h
    offs, pos = [], data_off
    for c in chunks:
        offs.append(pos)
        pos += len(c)
    p = str(tmp_path / "z.exr")
    with open(p, "wb") as f:
        f.write(header + struct.pack(f"<{h}q", *offs) + b"".join(chunks))

    out = exr.read_exr(p)
    assert out.shape == (h, w, 3)
    assert np.allclose(out, img.astype(np.float32))


def test_texture_from_file_kinds(png_rgb):
    path, _ = png_rgb
    t = image_io.texture_from_file(path, kind="rgb")
    assert t.kind == "rgb" and t.data.shape == (4, 6, 3)
    t = image_io.texture_from_file(path, kind="normal", flip_y=True)
    assert t.kind == "normal"


def test_asset_loader_prefers_real_obj(tmp_path, monkeypatch):
    # a real (non-stub) obj in the asset dir is picked up and height-fitted
    obj = tmp_path / "bunny.obj"
    obj.write_text(
        "v 0 0 0\nv 2 0 0\nv 0 4 0\nf 1 2 3\n")
    monkeypatch.setattr(mesh, "ASSET_DIR", str(tmp_path))
    m = mesh.bunny(scale=1.0)
    ys = m.positions[:, 1]
    assert abs((ys.max() - ys.min()) - 1.15) < 1e-5
    assert ys.min() == 0.0


def test_asset_loader_skips_lfs_stub(tmp_path, monkeypatch):
    obj = tmp_path / "bunny.obj"
    obj.write_text("version https://git-lfs.github.com/spec/v1\noid sha256:x\n")
    monkeypatch.setattr(mesh, "ASSET_DIR", str(tmp_path))
    m = mesh.bunny()           # falls back to the procedural blob
    assert len(m.indices) > 1000
