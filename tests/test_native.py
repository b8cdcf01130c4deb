"""Native host ops must agree bit-for-bit with the pure-Python oracle hash
(the C++ and Python implementations of FarmHash64 cross-validate each
other)."""

import numpy as np
import pytest

from recom_tpu.native import native_available, ops
from recom_tpu.oracle.hashing import farmhash64, hash_bucket_fast

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)


def _rand_strings(n, maxlen=200, seed=0):
    rng = np.random.default_rng(seed)
    return [
        "".join(chr(97 + int(c)) for c in rng.integers(0, 26, int(k)))
        for k in rng.integers(0, maxlen, n)
    ]


def test_farmhash_scalar_matches_python():
    from recom_tpu.native.build import get_lib

    lib = get_lib()
    for s in ["", "a", "Hello", "x" * 63, "x" * 64, "x" * 65, "y" * 1000]:
        assert lib.rt_farmhash64(s.encode(), len(s.encode())) == farmhash64(s)


def test_hash_strings_all_paths_match():
    strs = _rand_strings(300)
    ref = hash_bucket_fast(strs, 10**6)
    np.testing.assert_array_equal(ops.hash_strings(strs, 10**6), ref)
    np.testing.assert_array_equal(
        ops.hash_strings(np.array(strs), 10**6), ref
    )
    np.testing.assert_array_equal(
        ops.hash_strings(np.array(strs, dtype="S"), 10**6), ref
    )


def test_hash_ints_matches_python():
    rng = np.random.default_rng(1)
    ints = rng.integers(-(10**15), 10**15, 500)
    np.testing.assert_array_equal(
        ops.hash_ints(ints, 99991),
        hash_bucket_fast(list(ints), 99991),
    )
    np.testing.assert_array_equal(
        ops.hash_ints([0, -1, 1], 7), hash_bucket_fast([0, -1, 1], 7)
    )


def test_split_hash_padded_matches_python():
    rng = np.random.default_rng(2)
    pieces = _rand_strings(100, maxlen=12, seed=3)
    rows = []
    for _ in range(150):
        k = int(rng.integers(1, 7))
        rows.append(";".join(pieces[int(j)] or "q" for j in rng.integers(0, 100, k)))
    rows.append("")          # empty row -> zero pieces
    rows.append("solo")
    arr = np.array(rows, dtype="S")
    ids, maxp = ops.split_hash_padded(arr, ";", 10000, 8)
    assert maxp <= 8
    for i, r in enumerate(rows):
        parts = r.split(";") if r else []
        exp = list(hash_bucket_fast(parts, 10000)) + [-1] * (8 - len(parts))
        np.testing.assert_array_equal(ids[i], exp, err_msg=f"row {i}: {r!r}")
    assert ops.split_count_max(arr, ";") == maxp


def test_split_hash_rowlen_past_collect_buffer():
    """rowlen > 256 exceeds the wire kernel's piece-collect buffer
    (host_ops.cc SplitHashPadT starts/ends arrays): pieces past the buffer
    must still hash in place, identically to the scalar single-column
    kernel and the Python oracle."""
    from recom_tpu.oracle.hashing import hash_bucket_fast

    rng = np.random.default_rng(9)
    pieces = _rand_strings(50, maxlen=10, seed=11)
    rows = []
    for _ in range(40):
        k = int(rng.integers(250, 290))      # straddles the 256 cap
        rows.append(";".join(pieces[int(j)] or "q"
                             for j in rng.integers(0, 50, k)))
    rows.append("")
    arr = np.array(rows, dtype="S")
    rowlen = 300
    if ops.get_lib() is None:
        return
    out = np.empty((1, len(rows), rowlen), np.int32)
    maxp = ops.split_hash_multi_out(
        [arr], np.asarray([ord(";")], np.uint8),
        np.asarray([10007], np.int64), rowlen, out, len(rows),
    )
    ids_single, maxp_single = ops.split_hash_padded(arr, ";", 10007, rowlen)
    assert maxp == maxp_single
    np.testing.assert_array_equal(out[0], ids_single)
    parts = rows[0].split(";")
    exp = list(hash_bucket_fast(parts, 10007))
    np.testing.assert_array_equal(out[0, 0, : len(parts)], exp)


def test_split_empty_pieces_counted():
    # "a;;b" has 3 pieces incl the empty middle (tf.strings.split behavior)
    arr = np.array(["a;;b"], dtype="S")
    ids, maxp = ops.split_hash_padded(arr, ";", 100, 4)
    assert maxp == 3
    exp = hash_bucket_fast(["a", "", "b"], 100)
    np.testing.assert_array_equal(ids[0][:3], exp)


def test_delimited_engine_path_bitexact():
    from recom_tpu import Engine, EngineConfig
    from recom_tpu.models import make_random_batch
    from recom_tpu.models.synthetic import make_dlrm_model
    from recom_tpu.oracle import OracleModel

    m = make_dlrm_model(2, 1, 1, 3, 1, 2, [4], [8], name="nat",
                        large_rows=5_000)
    b = make_random_batch(m, 50, seed=4)
    eng = Engine(m, EngineConfig(use_pallas=False))
    out = eng.predict(b, return_pooled=True)
    ref = OracleModel(m).forward(b)
    for c, r in ref["pooled"].items():
        np.testing.assert_array_equal(out["pooled"][c], r)


def test_multi_column_calls_match_per_column():
    """The batched *_multi entry points must agree with the per-column
    native calls (same FarmHash, same bucketing, same padding)."""
    import numpy as np

    from recom_tpu.native import ops as native_ops

    if not native_ops.get_lib():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    batch = 64

    int_cols = [rng.integers(-(10**12), 10**12, batch) for _ in range(5)]
    int_buckets = [100, 1000, 7, 10**6, 33]
    multi = native_ops.hash_int_multi(int_cols, int_buckets)
    for j, (col, nb) in enumerate(zip(int_cols, int_buckets)):
        np.testing.assert_array_equal(
            multi[j], native_ops.hash_ints(col, nb).astype(np.int32)
        )

    str_cols = [
        np.asarray(
            ["u%d" % v for v in rng.integers(0, 10**6, batch)]
        ).astype("S")
        for _ in range(4)
    ]
    str_buckets = [50, 500, 5000, 13]
    multi = native_ops.hash_fixed_multi(str_cols, str_buckets)
    for j, (col, nb) in enumerate(zip(str_cols, str_buckets)):
        np.testing.assert_array_equal(
            multi[j], native_ops.hash_strings(col, nb).astype(np.int32)
        )

    def joined(n_max):
        return np.asarray(
            [
                ";".join(
                    "i%d" % v
                    for v in rng.integers(0, 1000, rng.integers(0, n_max + 1))
                )
                for _ in range(batch)
            ]
        ).astype("S")

    sp_cols = [joined(6), joined(3), joined(1)]
    delims = [b";", b";", b";"]
    sp_buckets = [100, 20, 7]
    cnt = native_ops.split_count_multi(sp_cols, delims)
    per = max(
        native_ops.split_count_max(a, ";") for a in sp_cols
    )
    assert cnt == per
    rowlen = 8
    multi, maxp = native_ops.split_hash_multi(
        sp_cols, delims, sp_buckets, rowlen
    )
    assert maxp == cnt
    for j, (col, nb) in enumerate(zip(sp_cols, sp_buckets)):
        packed, _ = native_ops.split_hash_padded(col, ";", nb, rowlen)
        np.testing.assert_array_equal(multi[j], packed)


def test_parse_criteo_native_matches_python(tmp_path, monkeypatch):
    """Native rt_parse_criteo vs the Python line loop: identical batches
    on a file with empty fields, short lines, negatives, decimals, mixed-
    case hex, and no trailing newline."""
    import numpy as np
    import pytest

    from recom_tpu.models import criteo as criteo_mod
    from recom_tpu.native import ops as native_ops

    if native_ops.parse_criteo(b"", 0) is None:
        pytest.skip("native lib unavailable")

    lines = [
        "1\t" + "\t".join(str(i) for i in range(1, 14)) + "\t"
        + "\t".join(f"{i:x}" for i in range(26)),
        "0\t\t2\t\t4.5\t-3\t6\t7\t8\t9\t10\t11\t12\t13\t"
        + "\t".join(["", "aB3", "FFFF"] + [f"{i * 7:08x}" for i in range(23)]),
        "\t\t\t",
        "1",
        "0\t" + "\t".join("0.125" for _ in range(13)) + "\t"
        + "\t".join("deadbeef" for _ in range(26)),
    ]
    p = tmp_path / "c.tsv"
    p.write_text("\n".join(lines))     # NO trailing newline

    def read_all(path, bs):
        return list(criteo_mod.read_criteo_tsv(str(path), bs))

    for bs in (2, 3, 64):
        nat = read_all(p, bs)
        monkeypatch.setattr(native_ops, "parse_criteo",
                            lambda *a, **k: None)
        pyo = read_all(p, bs)
        monkeypatch.undo()
        assert len(nat) == len(pyo)
        for (bn, ln), (bp, lp) in zip(nat, pyo):
            np.testing.assert_array_equal(ln, lp)
            assert set(bn) == set(bp)
            for k in bp:
                np.testing.assert_array_equal(bn[k], bp[k], err_msg=k)

    # chunk-boundary contract: a buffer cut mid-line consumes only the
    # complete lines and reports the cut position
    data = ("1\t2\t" + "x" * 10 + "\n0\t5").encode()
    l, d, c, n, used = native_ops.parse_criteo(data)
    assert n == 1 and used == data.index(b"\n") + 1
    assert l[0] == 1.0 and d[0, 0] == 2.0


def test_hash_fixed_multi_out_simd_sweep():
    """Direct sweep of the 8-lane AVX-512 fixed-width hash (ADVICE r04):
    widths 1..17 straddle the <=16B straight-line SIMD specialization,
    batches 1..19 straddle the 8-lane/scalar tail boundary, and fixtures
    include empty strings and full-width rows.  Every element must equal
    the scalar hash_strings path (itself validated vs the Python oracle
    above)."""
    rng = np.random.default_rng(7)
    for width in list(range(1, 18)) + [24, 32, 63, 64]:
        for batch in (1, 7, 8, 9, 16, 19):
            cols = []
            for c in range(3):
                rows = []
                for r in range(batch):
                    mode = (r + c) % 4
                    if mode == 0:
                        k = 0                        # empty string
                    elif mode == 1:
                        k = width                    # full-width row
                    else:
                        k = int(rng.integers(0, width + 1))
                    rows.append(bytes(rng.integers(97, 123, k).astype(np.uint8)))
                cols.append(np.array(rows, dtype=f"S{width}"))
            buckets = np.asarray([10**6, 997, 2], np.int64)
            out = np.full((3, batch, 1), -7, np.int32)
            ops.hash_fixed_multi_out(cols, buckets, out, batch)
            for c in range(3):
                want = ops.hash_strings(cols[c], int(buckets[c]))
                np.testing.assert_array_equal(
                    out[c, :, 0], want.astype(np.int32),
                    err_msg=f"width={width} batch={batch} col={c}",
                )


def test_hash_int_lut_simd_sweep():
    """The 8-lane int-LUT gather must agree element-for-element with the
    scalar LUT/format+hash path across block boundaries, including -1
    (missing), values past the LUT range (format+hash fallback), and
    all-in-range columns."""
    rng = np.random.default_rng(13)
    lut_size = 1024
    nb = 997
    lut = np.ascontiguousarray(
        ops.hash_ints(np.arange(lut_size, dtype=np.int64), nb), np.int32
    )
    for batch in (1, 7, 8, 9, 16, 33, 512):
        for mode in ("in_range", "with_miss", "with_large"):
            col = rng.integers(0, lut_size, batch).astype(np.int64)
            if mode == "with_miss" and batch > 2:
                col[batch // 2] = -1
            if mode == "with_large" and batch > 3:
                col[batch // 3] = 10**12
            out = np.full((1, batch, 1), -9, np.int32)
            ops.hash_int_multi_out(
                [col], np.asarray([nb], np.int64), out, batch,
                lut_ptrs=np.asarray([lut.ctypes.data], np.int64),
                luts=[lut], lut_size=lut_size,
            )
            want = np.where(
                col == -1, -1, ops.hash_ints(col, nb)
            ).astype(np.int32)
            np.testing.assert_array_equal(
                out[0, :, 0], want, err_msg=f"batch={batch} mode={mode}"
            )
