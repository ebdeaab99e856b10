"""Query correctness: device path == host numpy path == exact-match oracle.

* device/host equality is exact for any filter (same bit math).
* the exact-count oracle (set membership of k-mers between read and
  fragment) holds on low-load filters where Bloom false positives are
  ~1e-8 per window — mirrors the regime of the reference's count goldens
  (282/182 on a filter with ~150 insertions into 39.5M bits/bin slice,
  src/test/libIBFTests/read.hpp:235-241).
"""

import numpy as np
import pytest

from readbouncer_tpu.classify.math import ci_and_threshold_batch
from readbouncer_tpu.ibf.build import build_ibf, cut_out_nnns, fragment_bounds
from readbouncer_tpu.ibf.hashing import complement, encode_bases
from readbouncer_tpu.ibf.params import IBFParams
from readbouncer_tpu.ibf.query import FilterStack, umulhi_u32
from readbouncer_tpu.ibf.query_np import counts_np, max_count_np


def _rand_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, n))


def _fasta(tmp_path, name, records):
    p = tmp_path / name
    with open(p, "w") as f:
        for rid, seq in records:
            f.write(f">{rid}\n{seq}\n")
    return p


def test_umulhi_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, 4096, dtype=np.uint64).astype(np.uint32)
    for b in [1, 5, 12216, 1236269, 0xFFFFFFFF, 0x9E3779B1]:
        want = ((a.astype(np.uint64) * np.uint64(b)) >> np.uint64(32)).astype(np.uint32)
        got = np.asarray(umulhi_u32(jnp.asarray(a), b))
        np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def small_filters(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refs")
    rng = np.random.default_rng(42)
    seqs = {
        "refA": _rand_seq(rng, 2000),
        "refB": _rand_seq(rng, 1500),
    }
    params = IBFParams(kmer_size=13, fragment_length=100_000)  # low load -> FP ~ 0
    filters = {}
    for name, seq in seqs.items():
        path = _fasta(tmp, f"{name}.fasta", [(name, seq)])
        ibf, _ = build_ibf([path], params, name=name)
        filters[name] = (ibf, seq)
    return filters


def _exact_counts(ref_seq, read_seq, k, frag_len=100_000):
    """Oracle: windows of read whose k-mer occurs in the built fragment.

    STRING-level set membership — independent of the u32 code space, so
    it also catches k>=14 code-wrap effects (see test_k15_fragment200k)."""
    frag = cut_out_nnns(ref_seq)  # single fragment at this length
    (fs, fe), = fragment_bounds(len(frag), frag_len, k)
    frag = frag[fs:fe]
    ref_kmers = {frag[i : i + k] for i in range(len(frag) - k + 1)}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    rc_read = "".join(comp[c] for c in reversed(read_seq))
    fwd = sum(read_seq[i : i + k] in ref_kmers for i in range(len(read_seq) - k + 1))
    rc = sum(rc_read[i : i + k] in ref_kmers for i in range(len(rc_read) - k + 1))
    return fwd, rc


def test_counts_match_exact_oracle(small_filters):
    ibf, ref_seq = small_filters["refA"]
    read = ref_seq[300:650]  # 350bp on-target read
    c = counts_np(ibf, encode_bases(read))
    fwd, rc = _exact_counts(ref_seq, read, 13)
    assert c[0, 0] == fwd == 350 - 13 + 1  # perfect-identity read: all windows hit
    assert c[1, 0] == rc


def test_counts_revcomp_read(small_filters):
    ibf, ref_seq = small_filters["refA"]
    sub = ref_seq[100:400]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc_read = "".join(comp[c] for c in reversed(sub))
    c = counts_np(ibf, encode_bases(rc_read))
    # a reverse-complemented on-target read matches on the rc pass
    assert c[1, 0] == len(sub) - 13 + 1
    fwd_oracle, _ = _exact_counts(ref_seq, rc_read, 13)
    assert c[0, 0] == fwd_oracle  # ~0, random-ish


def test_counts_off_target_near_zero(small_filters):
    ibf, _ = small_filters["refA"]
    rng = np.random.default_rng(7)
    read = _rand_seq(rng, 400)
    c = counts_np(ibf, encode_bases(read))
    assert c.max() <= 2  # Bloom FP floor on a low-load filter


def test_device_matches_host(small_filters):
    ibf_a, seq_a = small_filters["refA"]
    ibf_b, seq_b = small_filters["refB"]
    stack = FilterStack([ibf_a, ibf_b])
    rng = np.random.default_rng(3)
    L = 360
    reads = [
        seq_a[50 : 50 + L],
        seq_b[700 : 700 + L],
        _rand_seq(rng, L),
        seq_a[1000 : 1000 + 200],  # shorter than L: padded
        "ACGTN" * 30,  # N-containing
        "",  # empty
    ]
    from readbouncer_tpu.classify.engine import encode_batch

    batch, lens = encode_batch(reads, L)
    dev = np.asarray(stack.counts(batch, lens))  # [R, 2, 128]
    for i, r in enumerate(reads):
        host_a = counts_np(ibf_a, encode_bases(r[:L]))
        host_b = counts_np(ibf_b, encode_bases(r[:L]))
        np.testing.assert_array_equal(dev[i, :, :64], host_a, err_msg=f"read {i} A")
        np.testing.assert_array_equal(dev[i, :, 64:], host_b, err_msg=f"read {i} B")


def test_max_counts_and_threshold(small_filters):
    ibf_a, seq_a = small_filters["refA"]
    ibf_b, seq_b = small_filters["refB"]
    stack = FilterStack([ibf_a, ibf_b])
    from readbouncer_tpu.classify.engine import encode_batch

    L = 250
    reads = [seq_a[0:L], seq_b[0:L], "ACGT" * 10]  # last: 40bp -> thr wraps
    batch, lens = encode_batch(reads, L)
    counts = stack.counts(batch, lens)
    thr = ci_and_threshold_batch(lens, 13, 0.1, 0.95)
    mx = np.asarray(stack.max_counts(counts, thr))
    assert mx.shape == (3, 2)
    assert mx[0, 0] == L - 13 + 1 and mx[1, 1] == L - 13 + 1
    assert mx[0, 1] <= 2 and mx[1, 0] <= 2
    # 40bp read: raw threshold is negative -> uint16 wrap -> nothing matches
    assert mx[2, 0] == 0 and mx[2, 1] == 0
    # host agrees
    assert max_count_np(ibf_a, encode_bases(reads[0]), int(thr[0])) == mx[0, 0]


def test_accum_ripple_matches_tree():
    """Both bit-plane accumulation strategies produce identical counts."""
    import numpy as np
    from readbouncer_tpu.ibf.query import _counts_impl

    rng = np.random.default_rng(11)
    rows, W, k, h = 997, 2, 5, 3
    bits = rng.integers(0, 1 << 32, size=(rows, W), dtype=np.uint32)
    reads = rng.integers(0, 4, size=(4, 40)).astype(np.uint8)
    lengths = np.array([40, 17, 4, 0], dtype=np.int32)
    a = _counts_impl(bits, reads, lengths, k=k, h=h, rows=rows, accum="ripple")
    b = _counts_impl(bits, reads, lengths, k=k, h=h, rows=rows, accum="tree")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# rbt2 (blocked rows) scheme — round 3


def test_rbt2_offsets_distinct_and_in_range():
    from readbouncer_tpu.ibf.hashing import block_offsets_np
    from readbouncer_tpu.ibf.query import block_offsets_jnp

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 1 << 32, size=5000, dtype=np.uint64).astype(np.uint32)
    for h in (1, 2, 3, 5):
        blk, offs = block_offsets_np(codes, h, 8 * 997)
        assert blk.max() < 997 and offs.max() < 8
        srt = np.sort(offs, axis=-1)
        if h > 1:
            assert (np.diff(srt, axis=-1) > 0).all()
        # device port is bit-identical
        import jax.numpy as jnp

        dblk, doffs = block_offsets_jnp(jnp.asarray(codes), h, 8 * 997)
        np.testing.assert_array_equal(np.asarray(dblk), blk)
        np.testing.assert_array_equal(
            np.stack([np.asarray(o) for o in doffs], axis=-1), offs
        )


def test_rbt2_counts_match_exact_oracle(tmp_path):
    """rbt2 device path == numpy oracle == exact containment counts."""
    from readbouncer_tpu.ibf.query import _counts_impl

    rng = np.random.default_rng(21)
    seq = _rand_seq(rng, 2500)
    path = _fasta(tmp_path, "r2.fasta", [("r2", seq)])
    params = IBFParams(kmer_size=13, fragment_length=100_000, hash_scheme="rbt2")
    ibf, _ = build_ibf([path], params, name="r2")
    assert ibf.scheme == "rbt2" and ibf.rows % 8 == 0
    stack = FilterStack([ibf])
    read = seq[300:550]
    from readbouncer_tpu.classify.engine import encode_batch

    enc, lens = encode_batch([read], 250)
    counts = np.asarray(stack.counts(enc, lens))[0]
    fwd, rc = _exact_counts(seq, read, 13)
    assert counts[0, 0] == fwd and counts[1, 0] == rc
    # numpy oracle agrees bin-for-bin
    oracle = counts_np(ibf, encode_bases(read))
    np.testing.assert_array_equal(counts[:, : ibf.padded_bins], oracle)
    # pallas accumulate path (interpret on CPU) agrees too
    import jax.numpy as jnp

    c_pl = np.asarray(
        _counts_impl(
            jnp.asarray(stack.bits),
            jnp.asarray(enc),
            jnp.asarray(lens),
            k=13,
            h=3,
            rows=stack.rows,
            scheme="rbt2",
            accum="pallas",
        )
    )[0]
    np.testing.assert_array_equal(c_pl, counts)


def test_rbt2_empirical_fp_rate(tmp_path):
    """A loaded rbt2 filter keeps its false-positive rate near max_fp.

    Builds at fragment_length=2000 (so the sizing solver's Poisson model
    is exercised at real load) and measures the per-window FP rate of
    off-target reads; the blocked-occupancy model should keep it within
    ~2x of the 0.01 target (sampling noise + model idealization).
    """
    rng = np.random.default_rng(33)
    seq = _rand_seq(rng, 2000)
    path = _fasta(tmp_path, "fp.fasta", [("fp", seq)])
    params = IBFParams(kmer_size=13, fragment_length=2000, hash_scheme="rbt2")
    ibf, _ = build_ibf([path], params, name="fp")
    k = 13
    n_windows = 0
    n_hits = 0
    for _ in range(40):
        read = _rand_seq(rng, 500)
        c = counts_np(ibf, encode_bases(read))
        # random 500-mers share essentially no true 13-mers with a random
        # 2 kb fragment (expected ~0.0001 per window) -> counts ~ FP hits
        n_windows += 2 * (500 - k + 1)
        n_hits += int(c[:, 0].sum())
    fp = n_hits / n_windows
    assert fp < 0.02, f"empirical FP {fp:.4f} vs target 0.01"


def test_accumulate_planes_pallas_odd_r2():
    """Direct call with R2 not a multiple of 8: the kernel pads the
    read-strand axis internally (ADVICE r3) and stays exact."""
    import jax.numpy as jnp

    from readbouncer_tpu.ops.ibf_count_pallas import (
        accumulate_planes_pallas,
        expand_planes,
    )

    rng = np.random.default_rng(5)
    R2, n_pad, W = 6, 128, 3
    n_valid = 100
    a = rng.integers(0, 2**32, size=(R2, n_pad, W), dtype=np.uint32)
    a[:, n_valid:, :] = 0  # padded windows must be zero
    n_planes = int(n_valid).bit_length()
    planes = accumulate_planes_pallas(jnp.asarray(a), n_planes, interpret=True)
    counts = np.asarray(expand_planes(planes))
    assert counts.shape == (R2, W * 32)
    bits = (a[:, :, :, None] >> np.arange(32, dtype=np.uint32)) & 1
    expect = bits.sum(axis=1).reshape(R2, W * 32)
    np.testing.assert_array_equal(counts, expect)


def test_planes_dual_max_matches_expand_oracle():
    """planes_dual_max_pallas (fused expansion + dual-threshold segment
    max) must equal expand_planes + _max_counts_impl at both thresholds,
    including uint16-wrapped (no-match) thresholds and masked bins."""
    import jax.numpy as jnp

    from readbouncer_tpu.ibf.query import _max_counts_impl
    from readbouncer_tpu.ops.ibf_count_pallas import (
        expand_planes,
        pack_bin_mask,
        planes_dual_max_pallas,
    )

    rng = np.random.default_rng(9)
    R, P, W = 24, 6, 4
    planes = rng.integers(0, 2**32, size=(2 * R, P, W), dtype=np.uint32)
    B = W * 32
    segments = ((0, 64), (64, 64))
    bin_mask = np.zeros(B, dtype=bool)
    bin_mask[:50] = True  # declared bins of segment 0
    bin_mask[64:120] = True  # segment 1
    # thresholds: small, zero, and uint16-wrapped (never matches)
    thr_b = rng.integers(0, 40, size=R).astype(np.uint32)
    thr_b[0] = 0
    thr_b[1] = 65529  # -7 wrap: no match
    thr_r = thr_b + rng.integers(0, 5, size=R).astype(np.uint32)

    mb, mr = planes_dual_max_pallas(
        jnp.asarray(planes),
        jnp.asarray(thr_b),
        jnp.asarray(thr_r),
        jnp.asarray(pack_bin_mask(bin_mask)),
        segments,
        interpret=True,
        read_block=8,
    )
    counts = np.asarray(expand_planes(jnp.asarray(planes)))  # [2R, B]
    counts3 = counts.reshape(R, 2, B)
    want_b = np.asarray(
        _max_counts_impl(
            jnp.asarray(counts3), jnp.asarray(thr_b), jnp.asarray(bin_mask),
            segments=segments,
        )
    )
    want_r = np.asarray(
        _max_counts_impl(
            jnp.asarray(counts3), jnp.asarray(thr_r), jnp.asarray(bin_mask),
            segments=segments,
        )
    )
    np.testing.assert_array_equal(np.asarray(mb), want_b)
    np.testing.assert_array_equal(np.asarray(mr), want_r)


def test_k15_fragment200k_exact_oracle(tmp_path):
    """The k=15 / fragment=200k regime — the reference's Guppy-accuracy
    recommendation (reference README.md:119; BASELINE config 4 geometry).

    At k>=14 the base-5 forward code exceeds 2^32 before the mod
    (ibf/hashing.py POW5), so DISTINCT k-mers can share a code — an FP
    source on top of the Bloom bound.  Measured (docs/PARITY.md "k>=14
    code wrap"): the wrap behaves like a uniform hash — extra FP rate
    ~m/2^32 ~ 4.7e-5 per window at m=200k genome k-mers, ~0.5% of the
    max_fp=0.01 Bloom budget, with no structural amplification (7
    in-genome collisions across 200k k-mers ~ the birthday expectation).

    This oracle asserts the regime end-to-end against STRING-level exact
    containment (which the wrap cannot fool):

    * no false negatives: codes are deterministic, so perfect-identity
      reads count FULL windows on the right strand,
    * the exact count is a floor, with only Bloom+wrap slack above,
    * the device path equals the numpy path at k=15.
    """
    rng = np.random.default_rng(99)
    seq = _rand_seq(rng, 150_000)
    k, frag_len = 15, 200_000
    params = IBFParams(kmer_size=k, fragment_length=frag_len)
    path = _fasta(tmp_path, "g15.fasta", [("g15", seq)])
    ibf, _ = build_ibf([path], params, name="g15")
    assert ibf.kmer_size == k

    read = seq[1000:1420]  # 420 bp perfect-identity on-target read
    c = counts_np(ibf, encode_bases(read))
    exact_fwd, exact_rc = _exact_counts(seq, read, k, frag_len)
    assert exact_fwd == 420 - k + 1
    assert c[0, 0] == exact_fwd  # every window hits, none lost to wrap

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc_read = "".join(comp[ch] for ch in reversed(read))
    c2 = counts_np(ibf, encode_bases(rc_read))
    assert c2[1, 0] == 420 - k + 1

    # off-target: string-exact containment is the floor; the ceiling is
    # exact + Bloom-FP + code-wrap slack (both ~1e-2/1e-5 per window —
    # a handful of windows at most over 2 x 1986 windows)
    off = _rand_seq(rng, 2000)
    c3 = counts_np(ibf, encode_bases(off))
    off_fwd, off_rc = _exact_counts(seq, off, k, frag_len)
    assert off_fwd <= c3[0, 0] <= off_fwd + 60
    assert off_rc <= c3[1, 0] <= off_rc + 60

    # device path == numpy path at k=15
    from readbouncer_tpu.classify.engine import encode_batch

    stack = FilterStack([ibf])
    L = 420
    batch, lens = encode_batch([read, off[:L]], L)
    dev = np.asarray(stack.counts(batch, lens))
    for i, r in enumerate([read, off[:L]]):
        host = counts_np(ibf, encode_bases(r[:L]))
        np.testing.assert_array_equal(dev[i, :, :64], host, err_msg=f"read {i}")
