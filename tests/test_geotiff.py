"""GeoTIFF codec round-trips (frmts/gtiff analog: tiled TIFF + GeoKey
directory; TIFF 6.0 / OGC GeoTIFF layouts)."""

import os
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.raster import geotiff as GT
from gdal_spark.raster import grid as G

TS = 16  # small tiles (multiple of 16 per spec) keep fixtures tiny


def _spec(w=40, h=35, crs="EPSG:4326"):
    return G.GridSpec(width=w, height=h,
                      gt=(10.0, 0.25, 0.0, 55.0, 0.0, -0.25),
                      crs=crs, tile=TS)


def _tiles(spark, spec, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for ty in range(spec.tiles_y):
        for tx in range(spec.tiles_x):
            h, w = spec.tile_shape(ty, tx)
            rows.append((ty, tx,
                         rng.integers(0, 200, h * w).astype(float).tolist()))
    return spark.createDataFrame(rows, G.TILE_SCHEMA)


def _collect(df):
    return {(r.tile_y, r.tile_x): np.asarray(r.px) for r in df.collect()}


@pytest.mark.parametrize("compression", ["deflate", "none"])
def test_roundtrip_float64(spark, tmp_path, compression):
    spec = _spec()
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "t.tif")
    GT.write_geotiff(tiles, spec, p, compression=compression)
    spec2, back = GT.read_geotiff(spark, p)
    assert spec2 == spec  # size, geotransform, crs, tile all survive
    want, got = _collect(tiles), _collect(back)
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k])


def test_roundtrip_uint8_and_nodata(spark, tmp_path):
    spec = _spec(w=TS * 2, h=TS)
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "b.tif")
    GT.write_geotiff(tiles, spec, p, dtype="uint8", nodata=255.0)
    spec2, back = GT.read_geotiff(spark, p)
    want, got = _collect(tiles), _collect(back)
    for k in want:
        np.testing.assert_array_equal(want[k] % 256, got[k])
    _, tags = GT._parse_ifd(p)
    assert tags[GT._TAG_BITS] == [8]
    nd = bytes(tags[GT._TAG_NODATA]).rstrip(b"\x00").decode()
    assert float(nd) == 255.0


def test_missing_tiles_fill_with_nodata(spark, tmp_path):
    spec = _spec(w=TS * 2, h=TS * 2)
    one = spark.createDataFrame(
        [(0, 0, [7.0] * (TS * TS))], G.TILE_SCHEMA)
    p = str(tmp_path / "m.tif")
    GT.write_geotiff(one, spec, p, nodata=-1.0)
    _, back = GT.read_geotiff(spark, p)
    got = _collect(back)
    assert len(got) == 4
    np.testing.assert_array_equal(got[(0, 0)], 7.0)
    np.testing.assert_array_equal(got[(1, 1)], -1.0)


def test_projected_crs_geokeys(spark, tmp_path):
    spec = G.GridSpec(width=TS, height=TS,
                      gt=(0.0, 100.0, 0.0, 0.0, 0.0, -100.0),
                      crs="EPSG:3857", tile=TS)
    tiles = spark.createDataFrame(
        [(0, 0, list(map(float, range(TS * TS))))], G.TILE_SCHEMA)
    p = str(tmp_path / "p.tif")
    GT.write_geotiff(tiles, spec, p)
    spec2, _ = GT.read_geotiff(spark, p)
    assert spec2.crs == "EPSG:3857"
    _, tags = GT._parse_ifd(p)
    shorts = tags[GT._TAG_GEOKEYS]
    assert 3072 in shorts and 3857 in shorts  # ProjectedCSTypeGeoKey


def test_header_is_classic_tiff(spark, tmp_path):
    spec = _spec(w=TS, h=TS)
    GT.write_geotiff(_tiles(spark, spec), spec, str(tmp_path / "h.tif"))
    head = open(str(tmp_path / "h.tif"), "rb").read(4)
    assert head == b"II*\x00"


def test_parallel_read_partitions(spark, tmp_path):
    spec = _spec(w=TS * 4, h=TS * 3)
    p = str(tmp_path / "par.tif")
    GT.write_geotiff(_tiles(spark, spec), spec, p)
    _, back = GT.read_geotiff(spark, p, partitions=5)
    assert back.rdd.getNumPartitions() == 5
    assert back.count() == 12


def test_add_overviews_gdaladdo(spark, tmp_path):
    spec = _spec(w=TS * 4, h=TS * 4)  # 64x64
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "ovr.tif")
    GT.write_geotiff(tiles, spec, p)
    GT.add_overviews(spark, p, levels=(2, 4), kernel="average")
    assert GT.overview_count(p) == 2
    # full-res survives the rewrite bit-exactly
    spec0, back0 = GT.read_geotiff(spark, p)
    assert spec0 == spec
    want = _collect(tiles)
    for k, v in _collect(back0).items():
        np.testing.assert_array_equal(v, want[k])
    # overview 1 = one 2x2 average reduction, same extent
    spec1, back1 = GT.read_geotiff(spark, p, overview=1)
    assert (spec1.width, spec1.height) == (32, 32)
    assert spec1.gt[1] == spec.gt[1] * 2 and spec1.gt[0] == spec.gt[0]
    full = np.zeros((64, 64))
    for (ty, tx), px in want.items():
        full[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS] = \
            px.reshape(TS, TS)
    expect1 = full.reshape(32, 2, 32, 2).mean(axis=(1, 3))
    got1 = np.zeros((32, 32))
    for r in back1.collect():
        h, w = spec1.tile_shape(r.tile_y, r.tile_x)
        got1[r.tile_y * TS:r.tile_y * TS + h,
             r.tile_x * TS:r.tile_x * TS + w] = \
            np.asarray(r.px).reshape(h, w)
    np.testing.assert_allclose(got1, expect1)
    # overview 2 halves again
    spec2, _ = GT.read_geotiff(spark, p, overview=2)
    assert (spec2.width, spec2.height) == (16, 16)
    with pytest.raises(ValueError, match="overview"):
        GT.read_geotiff(spark, p, overview=3)
    with pytest.raises(ValueError, match="powers of two"):
        GT.add_overviews(spark, p, levels=(3,))


def test_overview_odd_size_edges(spark, tmp_path):
    spec = _spec(w=40, h=35)  # non-multiple of 2*tile
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "odd.tif")
    GT.write_geotiff(tiles, spec, p)
    GT.add_overviews(spark, p, levels=(2,), kernel="near")
    spec1, back1 = GT.read_geotiff(spark, p, overview=1)
    assert (spec1.width, spec1.height) == (20, 18)
    # near kernel picks the top-left child pixel
    full = np.zeros((35, 40))
    for (ty, tx), px in _collect(tiles).items():
        h, w = spec.tile_shape(ty, tx)
        full[ty * TS:ty * TS + h, tx * TS:tx * TS + w] = px.reshape(h, w)
    got = np.zeros((18, 20))
    for r in back1.collect():
        h, w = spec1.tile_shape(r.tile_y, r.tile_x)
        got[r.tile_y * TS:r.tile_y * TS + h,
            r.tile_x * TS:r.tile_x * TS + w] = \
            np.asarray(r.px).reshape(h, w)
    np.testing.assert_array_equal(got[:17, :20], full[:34:2, ::2])


def test_multiband_separate_planes(spark, tmp_path):
    spec = _spec(w=TS * 2, h=TS * 2)
    bands = [_tiles(spark, spec, seed=i) for i in range(3)]
    p = str(tmp_path / "rgb.tif")
    GT.write_geotiff_bands(bands, spec, p, dtype="uint8")
    _, tags = GT._parse_ifd(p)
    assert tags[GT._TAG_SPP] == [3] and tags[GT._TAG_PLANAR] == [2]
    assert tags[GT._TAG_PHOTO] == [2]  # RGB
    assert len(tags[GT._TAG_TOFF]) == 12  # 4 tiles x 3 planes
    spec2, dfs = GT.read_geotiff_bands(spark, p)
    assert spec2 == spec and len(dfs) == 3
    for b in range(3):
        want, got = _collect(bands[b]), _collect(dfs[b])
        for k in want:
            np.testing.assert_array_equal(want[k] % 256, got[k])
    with pytest.raises(ValueError, match="band"):
        GT.read_geotiff(spark, p, band=3)


def test_cog_layout(spark, tmp_path):
    spec = _spec(w=TS * 4, h=TS * 4)
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "cog.tif")
    GT.write_geotiff(tiles, spec, p)
    GT.add_overviews(spark, p, levels=(2, 4), cog=True)
    # content identical to the classic layout
    spec0, back0 = GT.read_geotiff(spark, p)
    assert spec0 == spec
    want = _collect(tiles)
    for k, v in _collect(back0).items():
        np.testing.assert_array_equal(v, want[k])
    assert GT.overview_count(p) == 2
    # layout: IFD chain entirely before any pixel data, and overview
    # blocks before full-resolution blocks
    _, all_tags = GT._parse_ifds(p)
    first_data = min(min(t[GT._TAG_TOFF]) for t in all_tags)
    hdr = open(p, "rb").read(8)
    first_ifd = struct.unpack("<I", hdr[4:8])[0]
    assert first_ifd == 8  # metadata up front
    assert min(all_tags[2][GT._TAG_TOFF]) < min(all_tags[1][GT._TAG_TOFF])
    assert min(all_tags[1][GT._TAG_TOFF]) < min(all_tags[0][GT._TAG_TOFF])
    assert first_data > first_ifd
    # single-image COG write works too
    p2 = str(tmp_path / "cog1.tif")
    GT.write_geotiff(tiles, spec, p2, cog=True)
    spec2, back2 = GT.read_geotiff(spark, p2)
    for k, v in _collect(back2).items():
        np.testing.assert_array_equal(v, want[k])


def test_scope_fences(spark, tmp_path):
    spec = _spec(w=TS, h=TS)
    tiles = _tiles(spark, spec)
    with pytest.raises(ValueError, match="max_tiles"):
        GT.write_geotiff(tiles, _spec(w=TS * 300, h=TS * 300), str(
            tmp_path / "x.tif"), max_tiles=100)
    rot = G.GridSpec(width=TS, height=TS,
                     gt=(0.0, 1.0, 0.1, 0.0, 0.1, -1.0), tile=TS)
    with pytest.raises(NotImplementedError, match="rotated"):
        GT.write_geotiff(tiles, rot, str(tmp_path / "x.tif"))
    with pytest.raises(ValueError, match="byte-order"):
        bad = str(tmp_path / "bad.tif")
        open(bad, "wb").write(b"XX\x2a\x00" + b"\x00" * 16)
        GT.read_geotiff(spark, bad)


def test_add_overviews_multiband_keeps_all_bands(spark, tmp_path):
    """gdaladdo builds overview chains for EVERY band; the rewrite must
    preserve bands 1..n-1 bit-exactly and reduce each independently."""
    spec = _spec(w=TS * 2, h=TS * 2)
    bands = [_tiles(spark, spec, seed=10 + i) for i in range(3)]
    p = str(tmp_path / "rgb_ovr.tif")
    GT.write_geotiff_bands(bands, spec, p)
    GT.add_overviews(spark, p, levels=(2,), kernel="average")
    assert GT.overview_count(p) == 1
    spec0, dfs0 = GT.read_geotiff_bands(spark, p)
    assert spec0 == spec and len(dfs0) == 3
    fulls = []
    for b in range(3):
        want = _collect(bands[b])
        got = _collect(dfs0[b])
        full = np.zeros((spec.height, spec.width))
        for k, v in want.items():
            np.testing.assert_array_equal(got[k], v)
            full[k[0] * TS:(k[0] + 1) * TS, k[1] * TS:(k[1] + 1) * TS] = \
                v.reshape(TS, TS)
        fulls.append(full)
    # each band's overview is its own 2x2 average
    spec1, _ = GT.read_geotiff(spark, p, overview=1, band=0)
    assert (spec1.width, spec1.height) == (spec.width // 2, spec.height // 2)
    for b in range(3):
        _, df1 = GT.read_geotiff(spark, p, overview=1, band=b)
        got1 = np.zeros((spec1.height, spec1.width))
        for r in df1.collect():
            h, w = spec1.tile_shape(r.tile_y, r.tile_x)
            got1[r.tile_y * TS:r.tile_y * TS + h,
                 r.tile_x * TS:r.tile_x * TS + w] = \
                np.asarray(r.px).reshape(h, w)
        expect = fulls[b].reshape(spec1.height, 2, spec1.width, 2).mean(axis=(1, 3))
        np.testing.assert_allclose(got1, expect)


def test_lzw_roundtrip(spark, tmp_path):
    """LZW (TIFF 6.0 section 13, early-change) write + read."""
    spec = _spec(w=TS * 3, h=TS * 2)
    tiles = _tiles(spark, spec, seed=21)
    p = str(tmp_path / "lzw.tif")
    GT.write_geotiff(tiles, spec, p, compression="lzw", dtype="uint16")
    _, tags = GT._parse_ifd(p)
    assert tags[GT._TAG_COMP] == [5]
    spec2, back = GT.read_geotiff(spark, p)
    assert spec2 == spec
    want = _collect(tiles)
    got = _collect(back)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k] % 65536)


def test_lzw_predictor2_foreign_layout(spark, tmp_path):
    """A foreign LZW GeoTIFF with Predictor=2 (horizontal differencing
    — the common COG layout our writer never produces) must read back
    exactly: build the file by hand with differenced+LZW tiles and an
    explicit Predictor tag."""
    from gdal_spark.raster import lzw

    spec = _spec(w=TS * 2, h=TS)
    rng = np.random.default_rng(31)
    full = rng.integers(0, 255, (TS, TS * 2)).astype(np.uint8)
    blocks = []
    for tx in range(2):
        tile = full[:, tx * TS:(tx + 1) * TS]
        diff = tile.copy()
        diff[:, 1:] = tile[:, 1:] - tile[:, :-1]  # uint8 wraps
        blocks.append(lzw.encode(diff.tobytes()))
    p = str(tmp_path / "pred.tif")
    # emulate the foreign layout by injecting the Predictor tag into
    # the container writer's IFD (our writer never emits one by design)
    import gdal_spark.raster.geotiff as gt_mod
    orig = gt_mod._image_entries

    def with_pred(*a, **k):
        e = orig(*a, **k)
        e.append((GT._TAG_PRED, 3, 1, [2]))
        e.sort(key=lambda x: x[0])
        return e

    gt_mod._image_entries = with_pred
    try:
        GT._write_container(p, [(spec, "uint8", "lzw", None, blocks,
                                 False)])
    finally:
        gt_mod._image_entries = orig
    _, tags = GT._parse_ifd(p)
    assert tags[GT._TAG_COMP] == [5] and tags[GT._TAG_PRED] == [2]
    spec2, back = GT.read_geotiff(spark, p)
    got = _collect(back)
    for tx in range(2):
        np.testing.assert_array_equal(
            got[(0, tx)].reshape(TS, TS),
            full[:, tx * TS:(tx + 1) * TS].astype(float))


def _write_strip_tiff(path, full, rps=5, comp="none", big=False,
                      bo="<"):
    """Hand-assemble a strip-organized (optionally Big)TIFF fixture —
    the layout scanners/exports produce; our writer never emits it."""
    import struct
    import zlib as _z

    h, w = full.shape
    strips = []
    for r0 in range(0, h, rps):
        raw = full[r0:r0 + rps].astype("uint8").tobytes()
        strips.append(_z.compress(raw, 6) if comp == "deflate" else raw)
    comp_code = 8 if comp == "deflate" else 1
    entries = [
        (256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 1, [8]),
        (259, 3, 1, [comp_code]), (262, 3, 1, [1]),
        (277, 3, 1, [1]), (278, 4, 1, [rps]),
        (339, 3, 1, [1]),
        (33550, 12, 3, [0.25, 0.25, 0.0]),
        (33922, 12, 6, [0.0, 0.0, 0.0, 10.0, 55.0, 0.0]),
    ]
    fmt = {3: "H", 4: "I", 12: "d"}
    szs = {3: 2, 4: 4, 12: 8}
    if big:
        head = b"II+\x00\x08\x00\x00\x00" + struct.pack("<Q", 16)
        entry_sz, inline, cnt_fmt, off_fmt = 20, 8, "Q", "Q"
        ifd_head_sz = 8
    else:
        head = b"II*\x00" + struct.pack("<I", 8)
        entry_sz, inline, cnt_fmt, off_fmt = 12, 4, "I", "I"
        ifd_head_sz = 2
    # strip offsets/counts appended as external arrays after data
    n_entries = len(entries) + 2
    ifd_off = len(head)
    ifd_sz = ifd_head_sz + entry_sz * n_entries + (8 if big else 4)
    ext = bytearray()
    ext_base = ifd_off + ifd_sz

    def ext_put(typ, vals):
        nonlocal ext
        off = ext_base + len(ext)
        ext += struct.pack("<" + fmt[typ] * len(vals), *vals)
        return off

    built = []
    for tag, typ, cnt, vals in entries:
        size = szs[typ] * cnt
        if size <= inline:
            payload = struct.pack("<" + fmt[typ] * cnt, *vals)
            payload += b"\x00" * (inline - size)
        else:
            payload = struct.pack("<" + off_fmt, ext_put(typ, vals))
        built.append((tag, typ, cnt, payload))
    # data follows external payloads; compute strip offsets
    data_base = None
    offs, cnts = [], [len(s) for s in strips]
    # two passes: reserve external arrays for offsets/counts first
    off_arr_off = ext_base + len(ext)
    ext += b"\x00" * (4 * len(strips))
    cnt_arr_off = ext_base + len(ext)
    ext += b"\x00" * (4 * len(strips))
    data_base = ext_base + len(ext)
    cur = data_base
    for s in strips:
        offs.append(cur)
        cur += len(s)
    struct.pack_into("<" + "I" * len(strips), ext,
                     off_arr_off - ext_base, *offs)
    struct.pack_into("<" + "I" * len(strips), ext,
                     cnt_arr_off - ext_base, *cnts)
    built.append((273, 4, len(strips),
                  struct.pack("<" + off_fmt, off_arr_off)))
    built.append((279, 4, len(strips),
                  struct.pack("<" + off_fmt, cnt_arr_off)))
    built.sort(key=lambda e: e[0])
    out = bytearray(head)
    out += struct.pack("<Q" if big else "<H", n_entries)
    for tag, typ, cnt, payload in built:
        out += struct.pack("<HH", tag, typ)
        out += struct.pack("<" + cnt_fmt, cnt)
        out += payload
    out += struct.pack("<" + off_fmt, 0)  # no next IFD
    out += ext
    for s in strips:
        out += s
    open(path, "wb").write(out)


def test_strip_tiff_read(spark, tmp_path):
    """Strip-organized TIFFs (the common non-COG layout) read through
    the distributed strip->tile re-tiling path."""
    rng = np.random.default_rng(41)
    full = rng.integers(0, 255, (37, 300)).astype(np.uint8)
    p = str(tmp_path / "strips.tif")
    _write_strip_tiff(p, full, rps=5, comp="deflate")
    spec, tiles = GT.read_geotiff(spark, p)
    assert (spec.width, spec.height) == (300, 37)
    got = np.zeros((37, 300))
    for r in tiles.collect():
        h, w = spec.tile_shape(r.tile_y, r.tile_x)
        got[r.tile_y * spec.tile:r.tile_y * spec.tile + h,
            r.tile_x * spec.tile:r.tile_x * spec.tile + w] = \
            np.asarray(r.px).reshape(h, w)
    np.testing.assert_array_equal(got, full)


def test_bigtiff_strip_read(spark, tmp_path):
    """BigTIFF (magic 43, 8-byte offsets, LONG8 counts) parses and
    reads — foreign huge COG/export headers open."""
    rng = np.random.default_rng(43)
    full = rng.integers(0, 255, (12, 40)).astype(np.uint8)
    p = str(tmp_path / "big.tif")
    _write_strip_tiff(p, full, rps=4, big=True)
    spec, tiles = GT.read_geotiff(spark, p)
    assert (spec.width, spec.height) == (40, 12)
    got = np.zeros((12, 40))
    for r in tiles.collect():
        h, w = spec.tile_shape(r.tile_y, r.tile_x)
        got[:h, :w] = np.asarray(r.px).reshape(h, w)
    np.testing.assert_array_equal(got, full)


# ------------------------------------------------ packbits + bigtiff


def test_packbits_codec_spec_example():
    """The published TIFF 6.0 section 9 worked example (the original
    Apple PackBits stream) must decode to its documented expansion,
    and our encoder must round-trip arbitrary byte patterns."""
    from gdal_spark.raster import packbits as PB

    enc = bytes.fromhex("FEAA0280002AFDAA038000 2A22F7AA".replace(" ", ""))
    want = bytes.fromhex(
        "AAAAAA80002AAAAAAAAA80002A22" + "AA" * 10)
    assert PB.decode(enc) == want
    rng = np.random.default_rng(5)
    for pat in (b"", b"\x00" * 1000, bytes(rng.integers(0, 256, 4096,
                                                        dtype=np.uint8)),
                b"ab" * 300, b"x" * 129, b"x" * 128, b"yz" + b"q" * 3,
                bytes(rng.integers(0, 3, 2048, dtype=np.uint8))):
        assert PB.decode(PB.encode(pat)) == pat
    # runs compress: 64k of one byte fits in ~1k
    assert len(PB.encode(b"\x07" * 65536)) < 1100


def test_packbits_roundtrip(spark, tmp_path):
    spec = _spec()
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "pb.tif")
    GT.write_geotiff(tiles, spec, p, compression="packbits",
                     dtype="uint8")
    spec2, back = GT.read_geotiff(spark, p)
    assert spec2 == spec
    want, got = _collect(tiles), _collect(back)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k])


_REF_PB_STRIP = "/root/reference/autotest/gcore/data/seperate_strip.tif"
_REF_PB_TILED = "/root/reference/autotest/gcore/data/separate_tiled.tif"


@pytest.mark.skipif(not os.path.exists(_REF_PB_STRIP),
                    reason="reference fixtures not present")
def test_packbits_reference_layout_fixtures(spark):
    """Real libtiff-written PackBits files from the reference's own
    test data (band-separate planes, big-endian, one strip-organized
    and one tiled): band 2 must reproduce the checksum the reference's
    autotest pins (autotest/gcore/tiff_read.py:68-71 expects 15234)."""
    from gdal_spark.raster import checksum as CK

    for path in (_REF_PB_STRIP, _REF_PB_TILED):
        spec, tiles = GT.read_geotiff(spark, path, band=1)
        full = np.zeros((spec.height, spec.width))
        for r in tiles.collect():
            h, w = spec.tile_shape(r.tile_y, r.tile_x)
            full[r.tile_y * spec.tile:r.tile_y * spec.tile + h,
                 r.tile_x * spec.tile:r.tile_x * spec.tile + w] = \
                np.asarray(r.px).reshape(h, w)
        assert CK.checksum_np(full) == 15234, path


def test_bigtiff_write_roundtrip(spark, tmp_path):
    """bigtiff=True writes magic 43 with 8-byte offsets; our BigTIFF
    reader (which also reads foreign BigTIFFs) round-trips it, and
    overviews/multiband survive via the shared container writer."""
    spec = _spec()
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "big.tif")
    GT.write_geotiff(tiles, spec, p, bigtiff=True)
    with open(p, "rb") as f:
        head = f.read(8)
    assert head[:4] == b"II+\x00" and struct.unpack("<H", head[4:6])[0] == 8
    spec2, back = GT.read_geotiff(spark, p)
    assert spec2 == spec
    want, got = _collect(tiles), _collect(back)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k])
    # classic remains the default below the auto threshold
    p2 = str(tmp_path / "classic.tif")
    GT.write_geotiff(tiles, spec, p2)
    assert open(p2, "rb").read(4) == b"II*\x00"


def test_bigtiff_cog_layout(spark, tmp_path):
    spec = _spec()
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "bigcog.tif")
    GT.write_geotiff(tiles, spec, p, cog=True, bigtiff=True)
    assert open(p, "rb").read(4) == b"II+\x00"
    spec2, back = GT.read_geotiff(spark, p)
    want, got = _collect(tiles), _collect(back)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k])


_REF_ZSTD = "/root/reference/autotest/gcore/data/byte_zstd.tif"


@pytest.mark.skipif(not os.path.exists(_REF_ZSTD),
                    reason="reference fixtures not present")
def test_zstd_reference_fixture(spark):
    """A real libtiff-written ZSTD file (compression 50000): band 1
    must reproduce the checksum the reference's autotest pins
    (autotest/gcore/tiff_read.py:4014 expects 4672)."""
    from gdal_spark.raster import checksum as CK

    spec, tiles = GT.read_geotiff(spark, _REF_ZSTD)
    full = np.zeros((spec.height, spec.width))
    for r in tiles.collect():
        h, w = spec.tile_shape(r.tile_y, r.tile_x)
        full[r.tile_y * spec.tile:r.tile_y * spec.tile + h,
             r.tile_x * spec.tile:r.tile_x * spec.tile + w] = \
            np.asarray(r.px).reshape(h, w)
    assert CK.checksum_np(full) == 4672


def test_zstd_roundtrip(spark, tmp_path):
    spec = _spec()
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "z.tif")
    GT.write_geotiff(tiles, spec, p, compression="zstd")
    spec2, back = GT.read_geotiff(spark, p)
    assert spec2 == spec
    want, got = _collect(tiles), _collect(back)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k])


_REF_LERC = "/root/reference/autotest/gcore/data/byte_lerc.tif"


@pytest.mark.skipif(not os.path.exists(_REF_LERC),
                    reason="reference fixtures not present")
def test_lerc_reference_fixture(spark):
    """A real libtiff-written LERC file (compression 34887, raw Lerc2
    blobs): band 1 must reproduce the checksum the reference's
    autotest pins (autotest/gcore/tiff_read.py:4082 expects 4672)."""
    from gdal_spark.raster import checksum as CK

    spec, tiles = GT.read_geotiff(spark, _REF_LERC)
    full = np.zeros((spec.height, spec.width))
    for r in tiles.collect():
        h, w = spec.tile_shape(r.tile_y, r.tile_x)
        full[r.tile_y * spec.tile:r.tile_y * spec.tile + h,
             r.tile_x * spec.tile:r.tile_x * spec.tile + w] = \
            np.asarray(r.px).reshape(h, w)
    assert CK.checksum_np(full) == 4672


def test_lerc_roundtrip(spark, tmp_path):
    """maxZErr=0 LERC is lossless for every band type, incl. float64."""
    spec = _spec()
    tiles = _tiles(spark, spec)
    p = str(tmp_path / "lerc.tif")
    GT.write_geotiff(tiles, spec, p, compression="lerc")
    spec2, back = GT.read_geotiff(spark, p)
    assert spec2 == spec
    want, got = _collect(tiles), _collect(back)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k])
