"""Property-based tests (hypothesis) for the pure-Python hot
kernels — no Spark session, so hundreds of generated cases run in
seconds. These probe input space the fixed fixtures don't:
arbitrary boxes, lattice offsets, coordinate magnitudes, and random
quantized trajectories through the XTC codec.

Mirrors the reference's differential-testing philosophy (SURVEY.md
§5) with generated rather than fixed inputs; the oracles are
independent brute-force definitions, not the code under test.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dask_traj_spark.operators.kernels import displacements_np, distances_np

# --------------------------------------------------------------- helpers


def _ortho_box(lx, ly, lz):
    return np.diag([lx, ly, lz]).astype(np.float64)[None]


def _reduced_triclinic(lx, ly, lz, bx, cx, cy):
    """Lower-triangular reduced box: off-diagonals bounded by half
    the diagonal (GROMACS reduced form — what loaders produce)."""
    box = np.array(
        [[lx, 0.0, 0.0], [bx * lx, ly, 0.0], [cx * lx, cy * ly, lz]],
        dtype=np.float64,
    )
    return box[None]


def _brute_mic(d, box):
    """Independent oracle: minimize |d - i·a - j·b - k·c| over an
    image grid whose radius adapts to |d| / box size, so the global
    minimum is always inside the searched range (a fixed radius
    can't miss it). Vectorized over the whole grid."""
    a, b, c = box[0]
    min_diag = min(abs(a[0]), abs(b[1]), abs(c[2]))
    n = int(np.ceil(np.abs(d).max() / min_diag)) + 2
    r = np.arange(-n, n + 1)
    ii, jj, kk = np.meshgrid(r, r, r, indexing="ij")
    cand = (
        d[None, None, None, :]
        - ii[..., None] * a
        - jj[..., None] * b
        - kk[..., None] * c
    )
    return float(np.sqrt((cand**2).sum(-1).min()))


coords = st.floats(min_value=-5.0, max_value=5.0, width=32)
lengths = st.floats(min_value=0.5, max_value=4.0, width=32)
# the 27-image convention (mdtraj/GROMACS semantics this engine
# implements) is exact for *reduced* boxes: comparable edge lengths,
# off-diagonals well under half the diagonal. Generate in that
# regime so the adaptive brute force and the convention agree.
tri_lengths = st.floats(min_value=1.0, max_value=2.0, width=32)
skews = st.floats(min_value=-0.25, max_value=0.25, width=32)
images = st.integers(min_value=-2, max_value=2)


# --------------------------------------------------------------- MIC


@settings(max_examples=200, deadline=None)
@given(
    p=st.tuples(coords, coords, coords),
    q=st.tuples(coords, coords, coords),
    dims=st.tuples(lengths, lengths, lengths),
)
def test_ortho_mic_matches_brute_force(p, q, dims):
    xyz = np.array([[p, q]], dtype=np.float32)
    box = _ortho_box(*dims)
    got = distances_np(
        xyz, np.array([0]), np.array([1]), box, np.array([True])
    )[0, 0]
    want = _brute_mic(
        xyz[0, 1].astype(np.float64) - xyz[0, 0].astype(np.float64), box
    )
    assert got == pytest.approx(want, abs=2e-4)


@settings(max_examples=200, deadline=None)
@given(
    p=st.tuples(coords, coords, coords),
    q=st.tuples(coords, coords, coords),
    dims=st.tuples(tri_lengths, tri_lengths, tri_lengths),
    skew=st.tuples(skews, skews, skews),
)
def test_triclinic_mic_matches_brute_force(p, q, dims, skew):
    xyz = np.array([[p, q]], dtype=np.float32)
    box = _reduced_triclinic(*dims, *skew)
    got = distances_np(
        xyz, np.array([0]), np.array([1]), box, np.array([False])
    )[0, 0]
    want = _brute_mic(
        xyz[0, 1].astype(np.float64) - xyz[0, 0].astype(np.float64), box
    )
    assert got == pytest.approx(want, abs=2e-4)


@settings(max_examples=100, deadline=None)
@given(
    p=st.tuples(coords, coords, coords),
    q=st.tuples(coords, coords, coords),
    dims=st.tuples(tri_lengths, tri_lengths, tri_lengths),
    skew=st.tuples(skews, skews, skews),
    img=st.tuples(images, images, images),
)
def test_mic_invariant_under_lattice_translation(p, q, dims, skew, img):
    """Translating one endpoint by ANY lattice vector must not change
    the MIC distance — the defining property of the convention."""
    box = _reduced_triclinic(*dims, *skew)
    a, b, c = box[0]
    shift = img[0] * a + img[1] * b + img[2] * c
    xyz1 = np.array([[p, q]], dtype=np.float32)
    xyz2 = np.array([[p, tuple(np.array(q) + shift)]], dtype=np.float32)
    d1 = distances_np(xyz1, np.array([0]), np.array([1]), box, np.array([False]))
    d2 = distances_np(xyz2, np.array([0]), np.array([1]), box, np.array([False]))
    # float32 endpoints shifted by up to ~4 box lengths lose some ulps
    assert d1[0, 0] == pytest.approx(d2[0, 0], abs=5e-4)


@settings(max_examples=100, deadline=None)
@given(
    p=st.tuples(coords, coords, coords),
    q=st.tuples(coords, coords, coords),
    dims=st.tuples(tri_lengths, tri_lengths, tri_lengths),
    skew=st.tuples(skews, skews, skews),
)
def test_mic_displacement_consistent_with_distance(p, q, dims, skew):
    """|displacement| == distance on the same inputs (the two public
    kernels must agree)."""
    xyz = np.array([[p, q]], dtype=np.float32)
    box = _reduced_triclinic(*dims, *skew)
    disp = displacements_np(
        xyz, np.array([0]), np.array([1]), box, np.array([False])
    )
    dist = distances_np(
        xyz, np.array([0]), np.array([1]), box, np.array([False])
    )
    assert np.linalg.norm(disp[0, 0]) == pytest.approx(dist[0, 0], abs=1e-5)


# --------------------------------------------------------------- XTC codec


@settings(max_examples=25, deadline=None)
@given(
    n_atoms=st.integers(min_value=10, max_value=300),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    walk=st.floats(min_value=0.0009765625, max_value=0.5),
)
def test_xtc_codec_roundtrip_random_walks(tmp_path_factory, n_atoms, seed, walk):
    """write → decode is exact on the 1/precision grid for random
    walks of any step size (tiny steps exercise long delta runs,
    huge ones the whole-range fallback)."""
    import os

    from dask_traj_spark.sources import xtc as X

    rng = np.random.default_rng(seed)
    start = rng.uniform(0, 3, (1, n_atoms, 3))
    steps = rng.normal(0, walk, (2, n_atoms, 3))
    xyz = np.cumsum(np.concatenate([start, steps]), axis=0).astype(np.float32)
    time = np.arange(3, dtype=np.float64)

    p = str(tmp_path_factory.mktemp("xtc_prop") / "w.xtc")
    X._write_xtc_file(p, xyz, time, None, precision=1000.0)
    frames = []
    with open(p, "rb") as f:
        size = os.path.getsize(p)
        while f.tell() < size:
            frames.append(X.decode_frame(f))
    got = np.stack([fr[3] for fr in frames])
    q1 = np.round(xyz.astype(np.float64) * 1000).astype(np.int64)
    q2 = np.round(got.astype(np.float64) * 1000).astype(np.int64)
    assert (q1 == q2).all()


# ---------------------------------------------------------------- PNG


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 12),
    ch=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2 ** 31),
)
def test_png_codec_roundtrip_random(w, h, ch, seed):
    """encode_png → decode_png is the identity for any 8-bit image
    shape; heights ≥ 5 exercise every scanline filter type."""
    from dask_traj_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    ww, hh, cc, out = decode_png(encode_png(w, h, px, ch))
    assert (ww, hh, cc) == (w, h, ch)
    assert out.tobytes() == px


# ------------------------------------------------------ seq packing


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2 ** 31),
    n_docs=st.integers(1, 80),
    budget=st.sampled_from([16, 64, 257]),
)
def test_pack_sequences_invariants(spark, seed, n_docs, budget):
    """Distributed prefix sum == single-threaded reference: contiguous
    token ranges, bin arithmetic consistent, total conserved."""
    from dask_traj_spark.operators.curation import pack_sequences

    rng = np.random.default_rng(seed)
    rows = [
        (int(i), " ".join("t" for _ in range(int(rng.integers(1, 3 * budget)))))
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pdf = pack_sequences(docs, budget=budget, order_mode="mult").toPandas()
    A, M = 2654435761, 2 ** 32
    pdf["ord"] = (pdf["doc_id"] * A) % M
    pdf = pdf.sort_values(["ord", "doc_id"]).reset_index(drop=True)
    cum = 0
    for r in pdf.itertuples():
        assert r.start_seq == cum // budget
        assert r.offset == cum % budget
        assert r.n_seqs == (cum + r.n_tokens - 1) // budget - cum // budget + 1
        cum += r.n_tokens
    assert cum == pdf["n_tokens"].sum()


# ------------------------------------------------------- JPEG codec


@settings(max_examples=40, deadline=None)
@given(
    tiles=st.lists(st.integers(0, 255), min_size=1, max_size=6),
    rows=st.integers(1, 3),
)
def test_jpeg_constant_tiles_roundtrip_exact(tiles, rows):
    """ANY constant-tile grayscale image round-trips bit-exactly at
    quant=1: each block's only nonzero coefficient is its integer
    DC.  Random tile values exercise every DC category size and the
    inter-block diff chain, including sign changes."""
    from dask_traj_spark.operators.multimodal import decode_jpeg, encode_jpeg

    w, h = 8 * len(tiles), 8 * rows
    row = b"".join(bytes([t]) * 8 for t in tiles)
    px = row * (8 * rows)
    got_w, got_h, ch, out = decode_jpeg(encode_jpeg(w, h, px, channels=1, quant=1))
    assert (got_w, got_h, ch) == (w, h, 1)
    assert out == px


@settings(max_examples=20, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=64),
    quant=st.sampled_from([1, 2, 4, 8]),
)
def test_jpeg_arbitrary_block_bounded_error(data, quant):
    """Arbitrary 8×8 content at quant q: decode error is bounded by
    the quantization step (each coefficient moves at most q/2, IDCT
    is orthonormal so pixel error ≤ 8·(q/2) in the worst case; in
    practice ≪).  Guards against run-length or EOB bugs that corrupt
    whole blocks rather than nudging values."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import decode_jpeg, encode_jpeg

    px = (data + b"\x00" * 64)[:64]
    _, _, _, out = decode_jpeg(encode_jpeg(8, 8, px, channels=1, quant=quant))
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int)
        - np.frombuffer(px, np.uint8).astype(int)
    )
    assert err.max() <= 4 * quant + 1


# ------------------------------------------------------- HDF5 subset


@settings(max_examples=30, deadline=None)
@given(
    nf=st.integers(1, 12),
    na=st.integers(1, 9),
    names=st.sets(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
        ),
        min_size=1,
        max_size=4,
    ),
    seed=st.integers(0, 2**31 - 1),
)
def test_h5_roundtrip_any_shape_and_names(nf, na, names, seed, tmp_path_factory):
    """Arbitrary dataset names (heap offsets, SNOD name ordering)
    and leading-dim shapes round-trip through the vendored
    writer/reader, including partial-range reads at every offset."""
    import numpy as np

    from dask_traj_spark.sources.hdf5_pure import PureH5, write_h5

    rng = np.random.default_rng(seed)
    path = str(tmp_path_factory.mktemp("h5prop") / "f.h5")
    data = {}
    arrays = {}
    for n in sorted(names):
        a = rng.standard_normal((nf, na, 3)).astype("<f4")
        arrays[n] = a
        data[n] = ((nf, na, 3), "f32", a.tobytes())
    write_h5(path, data)
    with PureH5(path) as f:
        assert sorted(f.datasets) == sorted(names)
        for n, a in arrays.items():
            assert f.shape(n) == (nf, na, 3)
            np.testing.assert_array_equal(f.read(n), a)
            start = nf // 2
            np.testing.assert_array_equal(
                f.read(n, start, nf - start), a[start:]
            )


@settings(max_examples=25, deadline=None)
@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 3),
    channels=st.sampled_from([1, 3]),
    dc_split=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_jpeg_equals_baseline(bw, bh, channels, dc_split, seed):
    """For ANY image, the progressive encoding (spectral selection,
    optionally DC successive approximation) must decode bit-
    identically to the baseline encoding of the same pixels — the
    progression reorders bits, not information."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(seed)
    w, h = bw * 8, bh * 8
    px = rng.integers(0, 256, (h, w, channels)).astype(np.uint8).tobytes()
    base = decode_jpeg(encode_jpeg(w, h, px, channels, quant=1))
    prog = decode_jpeg(
        encode_jpeg_progressive(w, h, px, channels, quant=1, dc_split=dc_split)
    )
    assert prog == base


@settings(max_examples=50, deadline=None)
@given(
    sizes=st.lists(st.integers(0, 64), min_size=1, max_size=12),
    w=st.integers(1, 4096),
    h=st.integers(1, 4096),
    fps=st.integers(1, 120),
    seed=st.integers(0, 2**31 - 1),
)
def test_mp4_demux_any_sample_layout(sizes, w, h, fps, seed):
    """Arbitrary sample counts/sizes (including empty samples)
    round-trip through the BMFF writer/demuxer with byte-exact
    offset resolution."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        demux_mp4,
        encode_mp4,
        mp4_sample,
    )

    rng = np.random.default_rng(seed)
    samples = [rng.integers(0, 256, s).astype(np.uint8).tobytes() for s in sizes]
    b = encode_mp4(w, h, samples, fps=fps)
    info = demux_mp4(b)
    assert (info["width"], info["height"]) == (w, h)
    assert (info["timescale"], info["duration"]) == (fps, len(samples))
    assert info["sample_sizes"] == [len(s) for s in samples]
    for i, s in enumerate(samples):
        assert mp4_sample(b, info, i) == s


@settings(max_examples=25, deadline=None)
@given(
    nf=st.integers(1, 40),
    chunk=st.integers(1, 12),
    filt=st.sampled_from([None, ["gzip"], ["shuffle", "gzip"]]),
    kind=st.sampled_from(["f32", "f64", "i16"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_h5_chunked_any_geometry(nf, chunk, filt, kind, seed, tmp_path_factory):
    """Any (frames, chunk size, filter pipeline, dtype) combination
    round-trips through the chunked writer/reader, including reads
    at every possible start offset (edge-chunk padding must never
    leak)."""
    import numpy as np

    from dask_traj_spark.sources.hdf5_pure import PureH5, write_h5

    rng = np.random.default_rng(seed)
    dt = {"f32": "<f4", "f64": "<f8", "i16": "<i2"}[kind]
    if kind == "i16":
        a = rng.integers(-30000, 30000, (nf, 3)).astype(dt)
    else:
        a = rng.standard_normal((nf, 3)).astype(dt)
    path = str(tmp_path_factory.mktemp("h5chunk") / "c.h5")
    write_h5(
        path, {"d": ((nf, 3), kind, a.tobytes())},
        chunks={"d": chunk},
        filters={"d": filt} if filt else None,
    )
    with PureH5(path) as f:
        np.testing.assert_array_equal(f.read("d"), a)
        for start in range(0, nf, max(1, nf // 5)):
            np.testing.assert_array_equal(
                f.read("d", start, nf - start), a[start:]
            )


def test_decoder_exception_contract_under_mutation(tmp_path_factory):
    """Untrusted-bytes contract: single-byte mutations and
    truncations of valid JPEG/BMFF/PNG/TIFF/BMP/WAV/AVI/HDF5
    payloads may only raise the documented error classes
    (ValueError; zlib.error for corrupt deflate bodies) — never
    struct.error / IndexError / KeyError / OverflowError /
    MemoryError / RecursionError out of a Spark task."""
    import os
    import zlib

    from dask_traj_spark.operators.multimodal import (
        decode_avi,
        decode_bmp,
        decode_jpeg,
        decode_png,
        decode_tiff,
        decode_wav,
        demux_mp4,
        encode_avi,
        encode_bmp,
        encode_jpeg,
        encode_jpeg_progressive,
        encode_mp4,
        encode_png,
        encode_tiff,
        encode_wav,
    )
    from dask_traj_spark.sources.hdf5_pure import PureH5, write_h5

    rng = np.random.default_rng(97)
    jp = encode_jpeg(16, 16, bytes(256), 1)
    jpp = encode_jpeg_progressive(
        16, 16, bytes(256), 1, dc_split=True, restart_units=2
    )
    mp = encode_mp4(16, 16, [b"abcd", b"ef"])
    png = encode_png(9, 7, bytes(189), 3)
    tif = encode_tiff(8, 6, bytes(144), 3)
    bmp = encode_bmp(6, 5, bytes(90))
    wav = encode_wav(list(range(-50, 50)), 8000, 2)
    avi = encode_avi(8, 6, [bytes(48), bytes(range(48))], 5)
    td = tmp_path_factory.mktemp("fuzz")
    h5p = str(td / "f.h5")
    a = np.arange(60, dtype="<f4")
    write_h5(
        h5p, {"d": ((20, 3), "f32", a.tobytes())}, chunks={"d": 6},
        filters={"d": ["shuffle", "gzip"]},
    )
    h5 = open(h5p, "rb").read()

    def h5probe(payload):
        p2 = str(td / "m.h5")
        open(p2, "wb").write(payload)
        with PureH5(p2) as f:
            f.read("d")

    # KeyError is allowed ONLY for h5probe (a mutated header can drop
    # the dataset name, and dict-lookup KeyError on a missing dataset
    # is the documented PureH5 contract).  The codec decoders document
    # ValueError only — a blanket KeyError allowance would mask
    # exactly the escape class this test exists to catch.
    for src, fn in [(jp, decode_jpeg), (jpp, decode_jpeg),
                    (mp, demux_mp4), (png, decode_png),
                    (tif, decode_tiff), (bmp, decode_bmp),
                    (wav, decode_wav), (avi, decode_avi),
                    (h5, h5probe)]:
        allowed = (
            (ValueError, zlib.error, KeyError)
            if fn is h5probe
            else (ValueError, zlib.error)
        )
        for _ in range(150):
            b = bytearray(src)
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
            try:
                fn(bytes(b))
            except allowed:
                pass
        for cut in range(1, len(src), max(1, len(src) // 40)):
            try:
                fn(src[:cut])
            except allowed:
                pass


# ---------------------------------------------------------------------
# targeted reproductions of the round-7 review (ADVICE) findings:
# each crafted corrupt input previously escaped the documented
# ValueError contract (ZeroDivisionError / RecursionError out of a
# Spark task).  These pin the fixes.
# ---------------------------------------------------------------------


def test_jpeg_zero_sampling_factor_raises_valueerror():
    """A mutated SOF whose sampling-factor nibble is 0 must raise the
    documented ValueError, not ZeroDivisionError (ADVICE r7 #1)."""
    import struct

    import pytest

    from dask_traj_spark.operators.multimodal import decode_jpeg, encode_jpeg

    jp = bytearray(encode_jpeg(16, 16, bytes(256), 1))
    sof = jp.find(b"\xff\xc0")
    assert sof >= 0
    # SOF0 body: prec(1) h(2) w(2) nc(1), then cid(1) hv(1) tq(1);
    # hv byte of component 0 sits at sof + 4 (marker+len) + 6 + 1
    hv_off = sof + 4 + 6 + 1
    for hv in (0x10, 0x01, 0x00):  # vi=0, hi=0, both 0
        jp[hv_off] = hv
        with pytest.raises(ValueError, match="sampling factor"):
            decode_jpeg(bytes(jp))


def test_h5_zero_chunk_dim_raises_valueerror(tmp_path_factory):
    """A corrupt layout message with a zero chunk dimension must raise
    ValueError at parse time, not ZeroDivisionError in the chunk math
    (ADVICE r7 #2)."""
    import struct

    import numpy as np
    import pytest

    from dask_traj_spark.sources.hdf5_pure import PureH5, write_h5

    td = tmp_path_factory.mktemp("h5zero")
    p = str(td / "f.h5")
    a = np.arange(60, dtype="<f4")
    write_h5(p, {"d": ((20, 3), "f32", a.tobytes())}, chunks={"d": 6})
    raw = bytearray(open(p, "rb").read())
    # chunked layout v3 class 2 stores dims as <I: (6, 3, elem_size=4)
    pat = struct.pack("<3I", 6, 3, 4)
    i = raw.find(pat)
    assert i >= 0 and raw.find(pat, i + 1) == -1, "chunk-dims pattern not unique"
    raw[i : i + 4] = struct.pack("<I", 0)
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="chunk dims"):
        with PureH5(p) as f:
            f.read("d")


def test_h5_cyclic_chunk_btree_raises_valueerror(tmp_path_factory):
    """A self-referential chunk B-tree node must raise ValueError, not
    recurse to RecursionError (ADVICE r7 #3)."""
    import struct

    import numpy as np
    import pytest

    from dask_traj_spark.sources.hdf5_pure import PureH5, write_h5

    td = tmp_path_factory.mktemp("h5cycle")
    p = str(td / "f.h5")
    a = np.arange(60, dtype="<f4")
    write_h5(p, {"d": ((20, 3), "f32", a.tobytes())}, chunks={"d": 6})
    raw = bytearray(open(p, "rb").read())
    # the chunk B-tree is the TREE node of type 1 (byte 4 == 1);
    # the symbol-table B-tree (type 0) also matches b"TREE"
    node = -1
    j = raw.find(b"TREE")
    while j >= 0:
        if raw[j + 4] == 1:
            node = j
            break
        j = raw.find(b"TREE", j + 1)
    assert node >= 0, "no raw-data B-tree node found"
    raw[node + 5] = 1  # level 0 → 1: entries become child pointers
    # first child pointer follows the first key; key size = 8 + 8*ndims,
    # ndims = rank+1 = 3 → child addr at node + 24 + 32
    raw[node + 56 : node + 64] = struct.pack("<Q", node)
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="cyclic|B-tree|signature"):
        with PureH5(p) as f:
            f.read("d")


def test_mp4_deeply_nested_boxes_no_recursionerror():
    """~8 KB of crafted nested container boxes must surface as the
    documented ValueError, never RecursionError (ADVICE r7 #4)."""
    import struct

    import pytest

    from dask_traj_spark.operators.multimodal import demux_mp4

    payload = b""
    for _ in range(3000):  # far past CPython's default recursion limit
        payload = struct.pack(">I", len(payload) + 8) + b"moov" + payload
    data = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4 + payload
    with pytest.raises(ValueError):
        demux_mp4(data)


def test_mp4_deeply_nested_traks_no_recursionerror():
    """Nested trak boxes exercise the per-trak target-dict path of the
    iterative walker."""
    import struct

    import pytest

    from dask_traj_spark.operators.multimodal import demux_mp4

    payload = b""
    for _ in range(3000):
        payload = struct.pack(">I", len(payload) + 8) + b"trak" + payload
    data = struct.pack(">I", 16) + b"ftyp" + b"isom" + b"\x00" * 4 + payload
    with pytest.raises(ValueError):
        demux_mp4(data)


# ---------------------------------------------------------------------
# targeted reproductions of the round-8 review (ADVICE) findings:
# corrupt XTC headers/payloads and a corrupt fixed-array entry size
# that previously escaped the documented ValueError contract.
# ---------------------------------------------------------------------


def _xtc_compressed_frame(
    natoms=12,
    precision=1000.0,
    minint=(0, 0, 0),
    maxint=(7, 7, 7),
    smallidx=10,
    payload=b"\x00" * 24,
):
    """A syntactically-valid compressed XTC frame header + payload."""
    import struct

    from dask_traj_spark.sources import xtc as X

    hdr = struct.pack(">iiif", X.MAGIC, natoms, 0, 0.0)
    hdr += struct.pack(">9f", 1, 0, 0, 0, 1, 0, 0, 0, 1)
    hdr += struct.pack(">i", natoms)
    hdr += struct.pack(">f", precision)
    hdr += struct.pack(">3i", *minint) + struct.pack(">3i", *maxint)
    hdr += struct.pack(">ii", smallidx, len(payload))
    pad = -len(payload) % 4
    return hdr + payload + b"\x00" * pad


def test_xtc_zero_precision_raises_valueerror():
    """precision == 0.0 (or negative/NaN) must raise the documented
    ValueError, not ZeroDivisionError at inv = 1/precision
    (ADVICE r8 #1)."""
    import io

    import pytest

    from dask_traj_spark.sources.xtc import decode_frame

    for bad in (0.0, -1.0, float("nan")):
        with pytest.raises(ValueError, match="precision"):
            decode_frame(io.BytesIO(_xtc_compressed_frame(precision=bad)))


def test_xtc_inverted_int_range_raises_valueerror():
    """maxint < minint makes sizeint <= 0; `big % sz` must not
    ZeroDivisionError out of a Spark task (ADVICE r8 #1)."""
    import io

    import pytest

    from dask_traj_spark.sources.xtc import decode_frame

    for mx in ((-1, 7, 7), (7, -2, 7), (7, 7, -9)):
        with pytest.raises(ValueError, match="integer ranges"):
            decode_frame(io.BytesIO(_xtc_compressed_frame(maxint=mx)))


def test_xtc_smallidx_drift_raises_valueerror():
    """A payload of run headers that repeatedly decrement smallidx
    must raise ValueError when the index leaves [FIRSTIDX, len) —
    previously ssmall=0 ZeroDivisionError (uncaught) or silent
    negative indexing decoding garbage (ADVICE r8 #2)."""
    import io

    import pytest

    from dask_traj_spark.sources import xtc as X

    # sizeint (8,8,8) -> bitsize 10.  Each atom: one 10-bit whole-range
    # triple, flag bit 1, 5-bit run header 0 (run=0, is_smaller=-1).
    # Starting at FIRSTIDX+1 the second decrement leaves the table.
    w = X._BitWriter()
    for _ in range(3):
        w.ints([0, 0, 0], 10, (8, 8, 8))
        w.bits(1, 1)
        w.bits(0, 5)
    payload = w.finish() + b"\x00" * 16
    frame = _xtc_compressed_frame(smallidx=X.FIRSTIDX + 1, payload=payload)
    with pytest.raises(ValueError, match="drifted"):
        X.decode_frame(io.BytesIO(frame))


def test_h5_fixed_array_short_filtered_entry_raises(tmp_path):
    """A filtered (client 1) FAHD whose entry_size is 9-11 previously
    made the size width negative and silently decoded chunk size 0
    from an empty slice; it must raise the documented ValueError
    (ADVICE r8 #3).  The patched header carries a VALID checksum so
    the entry-size gate itself is what fires."""
    import struct

    import numpy as np
    import pytest

    from dask_traj_spark.sources.hdf5_pure import PureH5, _lookup3, write_h5

    p = str(tmp_path / "fa_short.h5")
    a = np.arange(60, dtype="<f4")
    write_h5(
        p,
        {"d": ((20, 3), "f32", a.tobytes())},
        chunks={"d": 5},
        filters={"d": ["shuffle", "gzip"]},
        fmt_version=2,
    )
    base = open(p, "rb").read()
    fa = base.index(b"FAHD")
    assert base[fa + 5] == 1 and base[fa + 6] == 20
    for bad in (9, 10, 11):
        b = bytearray(base)
        b[fa + 6] = bad
        struct.pack_into("<I", b, fa + 24, _lookup3(bytes(b[fa : fa + 24])))
        p2 = str(tmp_path / f"fa_{bad}.h5")
        open(p2, "wb").write(bytes(b))
        with PureH5(p2) as f:
            with pytest.raises(ValueError, match="entry size"):
                f.read("d")


def test_jpeg_lossless_golden_bitstream():
    """Hand-derived SOF3 stream for a 2x2 grayscale image, predictor
    1, Pt 0, samples [[100, 101], [98, 98]] — every byte below is
    worked out from T.81 Annex H + the canonical code rule of Annex
    C, independently of the encoder:

    - Huffman table (BITS [0,3,1,1,...], HUFFVAL 0..16): canonical
      codes — cat0 '00', cat1 '01', cat2 '10', cat3 '110',
      cat4 '1110', cat5 '11110', ...
    - (0,0): start-of-scan prediction 2^(8-1) = 128; diff = -28 →
      SSSS 5 ('11110'), additional bits = -28 + 31 = 3 → '00011'
    - (0,1): first line predicts from the left sample (100);
      diff = +1 → SSSS 1 ('01'), bits '1'
    - (1,0): first column predicts from above (100); diff = -2 →
      SSSS 2 ('10'), bits = -2 + 3 = 1 → '01'
    - (1,1): predictor 1 = left (98); diff = 0 → SSSS 0 ('00')
    - entropy bits: 11110 00011 01 1 10 01 00 = 19 bits, 1-padded
      to 0xF0 0xDC 0x9F."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    bits_str = "11110" + "00011" + "01" + "1" + "10" + "01" + "00"
    padded = bits_str + "1" * (-len(bits_str) % 8)
    entropy = bytes(
        int(padded[i : i + 8], 2) for i in range(0, len(padded), 8)
    )
    assert entropy == bytes([0xF0, 0xDC, 0x9F])

    ll_bits = bytes([0, 3] + [1] * 14)
    want = (
        b"\xff\xd8"
        + b"\xff\xc4" + (36).to_bytes(2, "big")  # DHT: 2+1+16+17
        + b"\x00" + ll_bits + bytes(range(17))
        + b"\xff\xc3" + (11).to_bytes(2, "big")  # SOF3: 2+6+3
        + bytes([8]) + (2).to_bytes(2, "big") + (2).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0])
        + b"\xff\xda" + (8).to_bytes(2, "big")   # SOS: 2+1+2+3
        + bytes([1, 1, 0x00, 1, 0, 0])
        + entropy
        + b"\xff\xd9"
    )
    samples = np.array([[100, 101], [98, 98]])
    got = encode_jpeg_lossless(2, 2, samples, predictor=1)
    assert got == want
    w, h, ch, px = decode_jpeg(want)
    assert (w, h, ch) == (2, 2, 1)
    assert list(px) == [100, 101, 98, 98]


def test_jpeg_lossless_restart_first_line_golden():
    """T.81 H.1.2.1 restart semantics, hand-derived (NOT a roundtrip
    — encoder and decoder mirror each other, so only a bitstream
    whose diffs are worked out by hand from the spec can catch a
    shared deviation): a 4x3 image under predictor 2 (Rb) with
    Ri = 6 samples restarts at (row 1, col 2).  The spec requires
    the 1-D horizontal predictor (Ra) for the WHOLE first line of
    each restart interval — so (1,3) predicts from Ra = 70, not
    from the scan predictor's Rb = 40 — with the 2^(P-Pt-1) default
    only for the interval's first sample (1,2).

    pixels            prediction (spec rule)           diff
    (0,0) 10          scan default 128                 -118
    (0,1..3) 20 30 40 first line -> Ra                 +10 each
    (1,0) 50          line start -> Rb = 10            +40
    (1,1) 60          predictor 2 -> Rb = 20           +40
    --- RST0 (6 samples coded) ---
    (1,2) 70          interval default 128             -58
    (1,3) 80          interval first line -> Ra = 70   +10
    (2,0..3) 90..120  predictor 2 -> Rb = 50..80       +40 each

    SSSS categories: -118 -> 7 (extra = -118+127 = 9), +10 -> 4
    (extra 10), +40 -> 6 (extra 40), -58 -> 6 (extra -58+63 = 5)."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        _BitWriter,
        _huff_encode_map,
        _LL_BITS,
        _LL_VALS,
        decode_jpeg,
        encode_jpeg_lossless,
    )

    codes = _huff_encode_map(_LL_BITS, _LL_VALS)
    bw = _BitWriter()

    def put(s: int, extra: int) -> None:
        c, ln = codes[s]
        bw.write(c, ln)
        if s:
            bw.write(extra, s)

    put(7, 9)                      # (0,0)
    for _ in range(3):
        put(4, 10)                 # (0,1..3)
    put(6, 40)                     # (1,0)
    put(6, 40)                     # (1,1)
    bw.restart(0)                  # Ri = 6 -> RST0
    put(6, 5)                      # (1,2) diff -58
    put(4, 10)                     # (1,3) Ra rule, NOT Rb
    for _ in range(4):
        put(6, 40)                 # (2,0..3)
    entropy = bw.flush()

    a = np.array(
        [[10, 20, 30, 40], [50, 60, 70, 80], [90, 100, 110, 120]]
    )
    stream = encode_jpeg_lossless(4, 3, a, predictor=2, dri=6)
    # encoder bytes end with the hand-built entropy segment + EOI
    assert stream.endswith(entropy + b"\xff\xd9")
    w, h, ch, px = decode_jpeg(stream)
    assert (w, h, ch) == (4, 3, 1)
    assert np.array_equal(
        np.frombuffer(px, dtype=np.uint8).reshape(3, 4), a
    )


@given(
    st.integers(2, 9), st.integers(2, 9), st.integers(1, 7),
    st.sampled_from([8, 12, 16]), st.integers(0, 2),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_lossless_roundtrip(w, h, predictor, prec, pt, seed):
    """Lossless means lossless: decode(encode(x)) == x exactly for
    every predictor/precision/point-transform combination (modulo
    the point transform's own truncation and the decoder's 8-bit
    output scaling)."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << prec, size=(h, w))
    if pt >= prec:
        pt = 0
    W, H, C, px = decode_jpeg(
        encode_jpeg_lossless(w, h, a, precision=prec, predictor=predictor,
                             pt=pt)
    )
    want = ((a >> pt) << pt) >> max(prec - 8, 0)
    got = np.frombuffer(px, dtype=np.uint8).reshape(H, W)
    assert (W, H, C) == (w, h, 1)
    assert np.array_equal(got, np.clip(want, 0, 255))


def test_jpeg_lossless_fuzz_valueerror_contract():
    """Corrupt SOF3 streams raise ValueError, never an internal
    error — same contract as the baseline/progressive paths."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(61)
    src = encode_jpeg_lossless(
        6, 6, rng.integers(0, 256, size=(6, 6)), predictor=4, dri=7
    )
    for _ in range(400):
        m = bytearray(src)
        m[rng.integers(0, len(m))] = rng.integers(0, 256)
        try:
            decode_jpeg(bytes(m))
        except ValueError:
            pass


def test_jpeg12_extended_sequential_roundtrip_and_goldens():
    """12-bit extended sequential (SOF1): constant 8x8 tiles at
    quant=1 reconstruct their exact 12-bit value (DC is an exact
    integer), scaled to the byte contract by >> 4; the header bytes
    pin Pq=1 16-bit DQT entries and the precision-12 SOF field; a
    random image at quant=1 is near-lossless at the 12-bit scale."""
    import struct as _struct

    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg12,
    )

    # constant tiles: 16x8, tiles valued 3000 and 512
    img = np.zeros((8, 16), dtype=np.int64)
    img[:, :8] = 3000
    img[:, 8:] = 512
    b = encode_jpeg12(16, 8, img)
    # golden header fields: DQT marker with Pq=1, 129-byte table body
    i = b.index(b"\xff\xdb")
    (dqt_len,) = _struct.unpack_from(">H", b, i + 2)
    assert dqt_len == 2 + 1 + 128 and b[i + 4] == 0x10
    assert b[i + 5 : i + 7] == b"\x00\x01"  # first 16-bit entry == 1
    j = b.index(b"\xff\xc1")
    assert b[j + 4] == 12  # SOF precision field
    w, h, c, px = decode_jpeg(b)
    got = np.frombuffer(px, np.uint8).reshape(8, 16)
    assert (w, h, c) == (16, 8, 1)
    assert (got[:, :8] == 3000 >> 4).all()
    assert (got[:, 8:] == 512 >> 4).all()
    # random content at quant=1: output bytes within 1 of source>>4
    rng = np.random.default_rng(7)
    a = rng.integers(0, 4096, size=(8, 8))
    _, _, _, px2 = decode_jpeg(encode_jpeg12(8, 8, a))
    got2 = np.frombuffer(px2, np.uint8).reshape(8, 8).astype(np.int64)
    assert np.abs(got2 - (a >> 4)).max() <= 1
    # 12-bit RGB path decodes through the 2048-centered transform
    rgb = rng.integers(0, 4096, size=(8, 8, 3))
    W, H, C, px3 = decode_jpeg(encode_jpeg12(8, 8, rgb, channels=3))
    assert (W, H, C) == (8, 8, 3)
    got3 = np.frombuffer(px3, np.uint8).reshape(8, 8, 3).astype(np.int64)
    assert np.abs(got3 - (rgb >> 4)).max() <= 3  # YCbCr roundtrip error
    # restart intervals reset predictors in 12-bit mode too
    _, _, _, px4 = decode_jpeg(encode_jpeg12(16, 8, img, restart_mcus=1))
    assert px4 == px
    # 12-bit under SOF0 stays refused
    bad = bytearray(b)
    bad[j + 1] = 0xC0
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="range"):
        encode_jpeg12(8, 8, np.full((8, 8), 4096))


def test_jpeg12_fuzz_valueerror_contract():
    """Corrupt 12-bit streams raise ValueError, never an internal
    error — the same contract as every other JPEG mode."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg12,
    )

    rng = np.random.default_rng(73)
    src = encode_jpeg12(
        8, 16, rng.integers(0, 4096, size=(16, 8)), restart_mcus=1
    )
    for _ in range(400):
        m = bytearray(src)
        m[rng.integers(0, len(m))] = rng.integers(0, 256)
        try:
            decode_jpeg(bytes(m))
        except ValueError:
            pass


def _upsample_j1112(p):
    """Test-side independent T.81 J.1.1.2 upsample: a plain double
    loop written from the spec text, not from the decoder."""
    import numpy as np

    h, w = p.shape
    oh = np.zeros((h, 2 * w), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            oh[y, 2 * x] = p[y, x]
            nxt = p[y, x + 1] if x + 1 < w else p[y, x]
            oh[y, 2 * x + 1] = (p[y, x] + nxt + 1) >> 1
    out = np.zeros((2 * h, 2 * w), dtype=np.int64)
    for y in range(h):
        out[2 * y] = oh[y]
        nxt = oh[y + 1] if y + 1 < h else oh[y]
        out[2 * y + 1] = (oh[y] + nxt + 1) >> 1
    return out


def test_jpeg_hierarchical_pipeline():
    """Hierarchical (Annex J): DHP + SOF0 base at half resolution +
    EXP + SOF5 differential.  Constant 16x16 tiles reconstruct
    BIT-EXACTLY, verified against a test-side chain that decodes the
    standalone baseline encoding of the same half image (the proven
    path) and upsamples with an independent spec-derived double
    loop; random content is within DCT rounding; structural and
    ordering violations raise."""
    import numpy as np
    import pytest as _pytest

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_hierarchical,
    )

    img = np.zeros((16, 32), dtype=np.uint8)
    img[:, :16] = 197
    img[:, 16:] = 43
    b = encode_jpeg_hierarchical(32, 16, img.tobytes())
    assert b.count(b"\xff\xde") == 1  # DHP
    assert b.count(b"\xff\xdf") == 1  # EXP
    assert b.count(b"\xff\xc5") == 1  # differential frame
    w, h, c, px = decode_jpeg(b)
    got = np.frombuffer(px, np.uint8).reshape(16, 32)
    assert (w, h, c) == (32, 16, 1)
    assert (got == img).all()

    # independent chain: decoded base through the PROVEN baseline
    # path + spec-derived upsample + the exact residual == the
    # hierarchical decode (constant tiles make every stage exact)
    half = np.round(
        (img[0::2, 0::2].astype(float) + img[0::2, 1::2]
         + img[1::2, 0::2] + img[1::2, 1::2]) / 4.0
    ).astype(np.uint8)
    _, _, _, bpx = decode_jpeg(encode_jpeg(16, 8, half.tobytes()))
    base = np.frombuffer(bpx, np.uint8).reshape(8, 16).astype(np.int64)
    up = _upsample_j1112(base)
    residual = img.astype(np.int64) - up
    expect = np.clip(up + residual, 0, 255)
    assert (got == expect).all()

    # random gray / rgb within DCT rounding at quant=1
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    _, _, _, p2 = decode_jpeg(encode_jpeg_hierarchical(16, 16, a.tobytes()))
    g2 = np.frombuffer(p2, np.uint8).reshape(16, 16).astype(int)
    assert np.abs(g2 - a.astype(int)).max() <= 1
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    W, H, C, p3 = decode_jpeg(
        encode_jpeg_hierarchical(16, 16, rgb.tobytes(), channels=3)
    )
    assert (W, H, C) == (16, 16, 3)
    g3 = np.frombuffer(p3, np.uint8).reshape(16, 16, 3).astype(int)
    assert np.abs(g3 - rgb.astype(int)).max() <= 3

    # ordering/structure violations are ValueErrors, not misparses
    i = b.index(b"\xff\xc5")
    trunc = b[: b.index(b"\xff\xde")] + b[b.index(b"\xff\xde") + 21 :]
    with _pytest.raises(ValueError):
        decode_jpeg(trunc)  # SOF5 without a DHP
    noexp = bytearray(b)
    j = noexp.index(b"\xff\xdf")
    del noexp[j : j + 5]  # strip EXP: differential dims exceed ref
    with _pytest.raises(ValueError, match="reference|dims"):
        decode_jpeg(bytes(noexp))
    swapped = bytearray(b)
    # a SEQUENTIAL scan relabeled differential-progressive (SOF6) is
    # structurally illegal: its Ss=0/Se=63 header is not a valid
    # progression — ValueError, never a misparse
    swapped[i + 1] = 0xC6
    with _pytest.raises(ValueError, match="spectral"):
        decode_jpeg(bytes(swapped))
    # a sequential scan relabeled differential LOSSLESS (SOF7) is
    # structurally illegal too: lossless scans must carry Ss=Se=0
    swapped[i + 1] = 0xC7
    with _pytest.raises(ValueError, match="Ss=Se=0"):
        decode_jpeg(bytes(swapped))
    with _pytest.raises(ValueError, match="16"):
        encode_jpeg_hierarchical(8, 8, bytes(64))

    # SOF7 lossless correction: lossy base + modulo-2^16 closer
    # reproduces the source EXACTLY (the hierarchy's headline
    # property; channels=1 so no color transform intervenes)
    for seed in (9, 23, 57):
        rng2 = np.random.default_rng(seed)
        src = rng2.integers(0, 256, size=(16, 32), dtype=np.uint8)
        bl = encode_jpeg_hierarchical(
            32, 16, src.tobytes(), lossless_correction=True
        )
        assert bl.count(b"\xff\xc7") == 1
        _, _, _, pl = decode_jpeg(bl)
        assert pl == src.tobytes()

    # SOF6 differential progressive carries identical information to
    # the SOF5 sequential form — decodes must be byte-identical
    for ch, src in ((1, a), (3, rgb)):
        seq = decode_jpeg(
            encode_jpeg_hierarchical(16, 16, src.tobytes(), channels=ch)
        )
        prog = decode_jpeg(
            encode_jpeg_hierarchical(
                16, 16, src.tobytes(), channels=ch, progressive=True
            )
        )
        assert seq == prog


def test_jpeg_hierarchical_fuzz_valueerror_contract():
    """Corrupt hierarchical streams raise ValueError, never an
    internal error."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_hierarchical,
    )

    rng = np.random.default_rng(83)
    px = rng.integers(0, 256, size=(16, 16), dtype=np.uint8).tobytes()
    seeds = [
        encode_jpeg_hierarchical(16, 16, px),
        encode_jpeg_hierarchical(16, 16, px, progressive=True),
        encode_jpeg_hierarchical(16, 16, px, lossless_correction=True),
    ]
    for src in seeds:
        for _ in range(250):
            m = bytearray(src)
            m[rng.integers(0, len(m))] = rng.integers(0, 256)
            try:
                decode_jpeg(bytes(m))
            except ValueError:
                pass


# ---------------------------------------------------------------------
# Arithmetic-coded JPEG (SOF9): the QM coder cross-validated against
# the system libjpeg — an independent T.81 implementation — in BOTH
# directions, so encoder/decoder agreement is never self-consistency.
# ---------------------------------------------------------------------


def _jpeg_oracle_bin(tmp_path):
    """Compile the libjpeg-driving oracle once; None when the
    container lacks gcc or libjpeg."""
    import shutil
    import subprocess

    cache = getattr(_jpeg_oracle_bin, "_path", "unset")
    if cache != "unset":
        return cache
    exe = str(tmp_path / "jpeg_oracle")
    if shutil.which("gcc") is None:
        _jpeg_oracle_bin._path = None
        return None
    r = subprocess.run(
        ["gcc", "-O2", "-o", exe, "tests/tools/jpeg_oracle.c", "-ljpeg"],
        capture_output=True,
    )
    _jpeg_oracle_bin._path = exe if r.returncode == 0 else None
    return _jpeg_oracle_bin._path


def test_jpeg_arith_qm_table_matches_libjpeg():
    """The hardcoded T.81 Table D.3 must equal the table the system
    libjpeg ships (exported ``jpeg_aritab``, packed Qe<<16 |
    NMPS<<8 | Switch<<7 | NLPS) — an independent public artifact."""
    import ctypes

    from dask_traj_spark.operators.multimodal import _QM_TAB

    try:
        lib = ctypes.CDLL("libjpeg.so.62")
    except OSError:
        try:
            lib = ctypes.CDLL("libjpeg.so")
        except OSError:
            pytest.skip("no system libjpeg")
    arr = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    for i, v in enumerate(arr):
        want = (
            (v >> 16) & 0xFFFF, v & 0x7F, (v >> 8) & 0x7F, (v >> 7) & 1
        )
        assert _QM_TAB[i] == want, f"row {i}"


def test_jpeg_arith_self_parity():
    """Huffman and arithmetic encodings of the same pixels carry
    identical quantized coefficients, so my decoder must produce
    byte-identical output for both — gray and RGB, with and without
    restart intervals.  Runs without gcc/libjpeg."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_arith,
    )

    for seed in range(4):
        rng = np.random.default_rng(seed)
        for (h, w), q, ch, rst in (
            ((16, 16), 1, 1, 0),
            ((8, 24), 3, 1, 2),
            ((16, 16), 1, 3, 0),
            ((16, 32), 2, 3, 3),
        ):
            a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            ja = encode_jpeg_arith(
                w, h, a.tobytes(), channels=ch, quant=q, restart_mcus=rst
            )
            jh = encode_jpeg(
                w, h, a.tobytes(), channels=ch, quant=q, restart_mcus=rst
            )
            assert ja.count(b"\xff\xc9") == 1 and b"\xff\xcc" in ja
            assert decode_jpeg(ja) == decode_jpeg(jh)


def test_jpeg_arith_cross_validated_with_libjpeg(tmp_path):
    """Both directions against the independent implementation:
    (a) libjpeg-encoded arithmetic streams decode under MY decoder to
    the same bytes as their libjpeg-Huffman twins (coefficient-level
    equality — my IDCT is the shared tail); (b) MY arithmetic
    streams decode under LIBJPEG to the same bytes as my Huffman
    twins.  Restart intervals and 3-channel interleave included;
    libjpeg's arithmetic PROGRESSIVE output stays a ValueError."""
    import subprocess

    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_arith,
    )

    exe = _jpeg_oracle_bin(tmp_path)
    if exe is None:
        pytest.skip("no gcc/libjpeg for the cross-oracle")

    def run(args, data):
        return subprocess.run([exe] + args, input=data,
                              capture_output=True).stdout

    for seed in range(4):
        rng = np.random.default_rng(seed)
        for (h, w), q, ch, rst in (
            ((16, 16), 100, 1, 0),
            ((24, 32), 75, 1, 2),
            ((16, 16), 90, 3, 0),
            ((8, 8), 50, 1, 1),
        ):
            a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            args = [str(w), str(h), str(ch), str(q), str(rst)]
            ja = run(["encode-arith"] + args, a.tobytes())
            jh = run(["encode-huff"] + args, a.tobytes())
            assert decode_jpeg(ja) == decode_jpeg(jh)  # direction (a)
            mja = encode_jpeg_arith(
                w, h, a.tobytes(), channels=ch, restart_mcus=rst
            )
            mjh = encode_jpeg(
                w, h, a.tobytes(), channels=ch, restart_mcus=rst
            )
            da = run(["decode"], mja)
            dh = run(["decode"], mjh)
            assert da and da == dh  # direction (b)
    # arithmetic PROGRESSIVE (SOF10): the four G.1.3 scan classes
    # decode to the exact bytes of their Huffman-progressive twins
    for seed in range(3):
        rng = np.random.default_rng(100 + seed)
        for (h, w), q, ch, rst in (
            ((16, 16), 100, 1, 0),
            ((24, 32), 75, 1, 2),
            ((16, 16), 90, 3, 0),
        ):
            a = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
            args = [str(w), str(h), str(ch), str(q), str(rst)]
            ja = run(["encode-arith-prog"] + args, a.tobytes())
            jh = run(["encode-huff-prog"] + args, a.tobytes())
            assert ja.count(b"\xff\xca") == 1
            assert decode_jpeg(ja) == decode_jpeg(jh)


def test_jpeg_arith_fuzz_valueerror_contract():
    """Corrupt arithmetic streams raise ValueError, never an
    internal error or a hang."""
    import numpy as np

    from dask_traj_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_arith,
    )

    rng = np.random.default_rng(97)
    src = encode_jpeg_arith(
        16, 16, rng.integers(0, 256, size=(16, 16), dtype=np.uint8).tobytes(),
        restart_mcus=2,
    )
    for _ in range(400):
        m = bytearray(src)
        m[rng.integers(0, len(m))] = rng.integers(0, 256)
        try:
            decode_jpeg(bytes(m))
        except ValueError:
            pass


@given(
    st.lists(st.tuples(st.integers(0, 5), st.integers(0, 1)),
             min_size=1, max_size=400),
)
@settings(max_examples=150, deadline=None)
def test_qm_coder_roundtrip_random_decisions(seq):
    """The raw QM coder pair is lossless on arbitrary decision
    sequences over arbitrary adaptive bins — the register-level
    property (carry chains through stacked 0xFF bytes, byte
    stuffing, CLEARBITS flush, trailing-zero drop + decoder
    zero-fill) that image-shaped tests cannot fully reach."""
    from dask_traj_spark.operators.multimodal import (
        _QMByteSrc,
        _QMDecoder,
        _QMEncoder,
    )

    enc = _QMEncoder()
    est = bytearray(6)
    for bin_, d in seq:
        enc.encode(est, bin_, d)
    data = enc.flush()
    dec = _QMDecoder(_QMByteSrc(data, 0))
    dst = bytearray(6)
    for bin_, d in seq:
        assert dec.decode(dst, bin_) == d
    assert dst == est  # adaptive states must track identically


# ------------------------------------- d22 quality-apportioned weights


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 2 ** 31),
    n_docs=st.integers(2, 40),
    n_pairs=st.integers(0, 30),
)
def test_quality_soft_dedup_invariants_random_graphs(
    spark, seed, n_docs, n_pairs
):
    """d22 on random corpora and random pair graphs: every cluster's
    weights sum to ~1 (conservation), all weights are in (0, 1], a
    singleton's weight is exactly 1.0, and within a component the
    weight ordering matches the (snapped) quality ordering — exact,
    since weights share the component denominator."""
    from dask_traj_spark.operators.dedup import quality_soft_dedup_weights

    rng = np.random.default_rng(seed)
    words = ["the", "cat", "runs", "fast", "zz", "qq", "data", "spark"]
    rows = [
        (
            int(i),
            " ".join(rng.choice(words, size=int(rng.integers(1, 12)))),
        )
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pr = [
        (int(a), int(b))
        for a, b in rng.integers(0, n_docs, size=(n_pairs, 2))
        if a != b
    ]
    pairs = spark.createDataFrame(pr or [(0, 1)], "id1 long, id2 long")
    pdf = quality_soft_dedup_weights(docs, pairs).toPandas()
    assert len(pdf) == n_docs
    assert ((pdf["weight"] > 0) & (pdf["weight"] <= 1.0)).all()
    grp = pdf.groupby("component")
    np.testing.assert_allclose(grp["weight"].sum(), 1.0, rtol=1e-9)
    sizes = grp.size()
    singles = pdf[pdf["component"].map(sizes) == 1]
    assert (singles["weight"] == 1.0).all()  # q/q exact
    for _, g in grp:
        by_q = g.sort_values(["quality", "doc_id"]).reset_index(drop=True)
        assert by_q["weight"].is_monotonic_increasing
