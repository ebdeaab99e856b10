"""Fused whole-read device path vs the chunk-wave oracle."""

import numpy as np
import pytest

from readbouncer_tpu.classify.engine import ClassifyEngine
from readbouncer_tpu.classify.fused import (
    jax_classify_decisions,
    jax_live_decisions,
    make_fused_live_fn,
    threshold_table,
)
from readbouncer_tpu.classify.math import ci_and_threshold_batch
from readbouncer_tpu.classify.policy import classify_decisions, live_decisions
from readbouncer_tpu.ibf.build import build_ibf
from readbouncer_tpu.ibf.params import IBFParams
from readbouncer_tpu.ibf.query import FilterStack


@pytest.fixture(scope="module")
def filters(tmp_path_factory):
    rng = np.random.default_rng(17)
    td = tmp_path_factory.mktemp("fused")
    bases = np.array(list("ACGT"))
    params = IBFParams(kmer_size=13, fragment_length=2000)
    genomes, tf, df = {}, [], []
    for i in range(2):
        g = "".join(bases[rng.integers(0, 4, size=8000)])
        genomes[f"t{i}"] = g
        p = td / f"t{i}.fasta"
        p.write_text(f">t{i}\n{g}\n")
        tf.append(build_ibf([p], params, name=f"t{i}")[0])
    g = "".join(bases[rng.integers(0, 4, size=8000)])
    genomes["d"] = g
    p = td / "d.fasta"
    p.write_text(f">d\n{g}\n")
    df.append(build_ibf([p], params, name="d")[0])
    return genomes, tf, df


def _mixed_reads(genomes, rng, n=64, length=520):
    bases = np.array(list("ACGT"))
    seqs = []
    keys = list(genomes)
    for i in range(n):
        if i % 4 == 3:
            seqs.append("".join(bases[rng.integers(0, 4, size=length)]))
        else:
            g = genomes[keys[i % len(keys)]]
            s = rng.integers(0, len(g) - length)
            arr = np.frombuffer(g[s : s + length].encode(), np.uint8).copy()
            mut = rng.random(length) < 0.08
            arr[mut] = np.frombuffer(b"ACGT", np.uint8)[
                rng.integers(0, 4, size=int(mut.sum()))
            ]
            seqs.append(bytes(arr).decode())
    # a few short / odd-length reads to hit partial chunks
    seqs[0] = seqs[0][:251]
    seqs[1] = seqs[1][:260]
    return seqs


@pytest.mark.parametrize("mode", ["both", "targets_only", "depletes_only"])
def test_fused_matches_wave_oracle(filters, mode):
    genomes, tf, df = filters
    rng = np.random.default_rng(5)
    seqs = _mixed_reads(genomes, rng)
    kw = dict(error_rate=0.1, chunk_length=250, max_chunks=2, batch_size=32)
    if mode == "targets_only":
        engine = ClassifyEngine(tf, [], **kw)
    elif mode == "depletes_only":
        engine = ClassifyEngine([], df, **kw)
    else:
        engine = ClassifyEngine(tf, df, **kw)
    c1, b1, a1 = engine.classify_sequences(seqs)
    c2, b2, a2 = engine.classify_sequences_waves(seqs)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(a1, a2)


def test_threshold_table_matches_batch_math():
    tab = threshold_table(300, 13, 0.1, 0.95)
    lens = np.arange(301)
    np.testing.assert_array_equal(tab, ci_and_threshold_batch(lens, 13, 0.1, 0.95))


def test_jax_policies_match_numpy():
    rng = np.random.default_rng(0)
    R, F = 64, 3
    args = [rng.integers(0, 3, size=(R, F)) for _ in range(4)]
    c_np, b_np = classify_decisions(*args)
    c_j, b_j = jax_classify_decisions(*[a for a in args])
    np.testing.assert_array_equal(np.asarray(c_j), c_np)
    np.testing.assert_array_equal(np.asarray(b_j), b_np)

    d_np = live_decisions(*args)
    d_j = jax_live_decisions(*[a for a in args])
    np.testing.assert_array_equal(np.asarray(d_j), d_np)


def test_fused_live_matches_policy(filters):
    genomes, tf, df = filters
    rng = np.random.default_rng(9)
    seqs = _mixed_reads(genomes, rng, n=32, length=400)
    stacks_t = FilterStack(tf)
    stacks_d = FilterStack(df)
    fn = make_fused_live_fn(stacks_t, stacks_d, 512, 0.1, 0.95)

    from readbouncer_tpu.classify.engine import encode_batch

    reads, lens = encode_batch(seqs, 512)
    got = np.asarray(fn(reads, lens))

    thr = lambda s, r: ci_and_threshold_batch(lens, s.kmer_size, r, 0.95)
    tc = stacks_t.counts(reads, lens)
    dc = stacks_d.counts(reads, lens)
    want = live_decisions(
        np.asarray(stacks_d.max_counts(dc, thr(stacks_d, 0.1))),
        np.asarray(stacks_t.max_counts(tc, thr(stacks_t, 0.1))),
        np.asarray(stacks_d.max_counts(dc, thr(stacks_d, 0.08))),
        np.asarray(stacks_t.max_counts(tc, thr(stacks_t, 0.08))),
    )
    np.testing.assert_array_equal(got, want)


def test_two_phase_boundary_lengths(filters):
    """Exact boundary lengths through the two-phase engine (VERDICT r2 #8).

    * len == chunk_length (exactly one full chunk; phase B must NOT run)
    * len == (C-1)*cl + k - 1 and + k and + k + 1 — the fail/unclassified
      boundary of the driver (engine.classify_read_files fail_below)
    * len just over a chunk boundary (cl + 1: 1-base second chunk < k)
    """
    genomes, tf, df = filters
    rng = np.random.default_rng(9)
    cl, C = 250, 3
    engine = ClassifyEngine(tf, df, error_rate=0.1, chunk_length=cl,
                            max_chunks=C, batch_size=16)
    g = genomes["t0"]
    lengths = [
        cl,                       # exactly one chunk
        cl + 1,                   # second chunk of 1 base (< k)
        cl + 12,                  # second chunk of k-1 (unmatched, not error)
        cl + 13,                  # second chunk of exactly k
        (C - 1) * cl + 12,        # last chunk k-1
        (C - 1) * cl + 13,        # last chunk exactly k
        (C - 1) * cl + 14,
        C * cl,                   # full length
    ]
    seqs = []
    for i, L in enumerate(lengths):
        s = int(rng.integers(0, len(g) - C * cl))
        seqs.append(g[s : s + L])
        # also an off-target read of the same length (runs every chunk)
        seqs.append("".join("ACGT"[j] for j in rng.integers(0, 4, L)))
    c1, b1, a1 = engine.classify_sequences(seqs)
    c2, b2, a2 = engine.classify_sequences_waves(seqs)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(a1, a2)
    # on-target single-chunk read classifies in phase A with 1 attempt
    assert c1[0] and a1[0] == 1


def test_two_phase_all_unresolved_padding(filters):
    """An all-unresolved phase-B batch with m2 < B exercises the padding
    path (engine.classify_sequences phase B: rb/lb zero-fill)."""
    genomes, tf, df = filters
    rng = np.random.default_rng(10)
    # 5 random reads (nothing classifies) of 3-chunk length, batch 16:
    # phase B gets a single underfull bucket
    seqs = ["".join("ACGT"[j] for j in rng.integers(0, 4, 750)) for _ in range(5)]
    engine = ClassifyEngine(tf, df, error_rate=0.1, chunk_length=250,
                            max_chunks=3, batch_size=16)
    c1, b1, a1 = engine.classify_sequences(seqs)
    c2, b2, a2 = engine.classify_sequences_waves(seqs)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(a1, a2)
    assert not c1.any() and (a1 == 3).all()


def test_overlap_pool_engine_matches_serial(filters):
    """overlap_pool=True (speculative pool upload + on-device row gather,
    make_fused_classify_indexed_fn) must produce identical decisions to
    the default serial phase-B path and the wave oracle."""
    genomes, tf, df = filters
    rng = np.random.default_rng(11)
    g = genomes["t0"]
    seqs = [g[i : i + 600] for i in range(0, 1800, 600)]
    seqs += ["".join("ACGT"[j] for j in rng.integers(0, 4, 700)) for _ in range(5)]
    kw = dict(error_rate=0.1, chunk_length=250, max_chunks=3, batch_size=8)
    e_overlap = ClassifyEngine(tf, df, overlap_pool=True, **kw)
    e_serial = ClassifyEngine(tf, df, **kw)
    c1, b1, a1 = e_overlap.classify_sequences(seqs)
    c2, b2, a2 = e_serial.classify_sequences(seqs)
    c3, b3, a3 = e_serial.classify_sequences_waves(seqs)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(b1, b2)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(c1, c3)
    np.testing.assert_array_equal(b1, b3)
    np.testing.assert_array_equal(a1, a3)


def test_classify_sequences_empty(filters):
    """classify_sequences([]) returns empty arrays (no device dispatch)."""
    genomes, tf, df = filters
    e = ClassifyEngine(tf, df, error_rate=0.1, chunk_length=250, max_chunks=3, batch_size=8)
    c, b, a = e.classify_sequences([])
    assert c.shape == (0,) and b.shape == (0,) and a.shape == (0,)


def test_pipelined_sequences_match_serial(filters):
    """classify_sequences_pipelined (depth-2 submit/finish pipeline) must
    equal classify_sequences exactly for any host-batch split."""
    genomes, tf, df = filters
    rng = np.random.default_rng(31)
    seqs = _mixed_reads(genomes, rng, n=40, length=600)
    e = ClassifyEngine(tf, df, error_rate=0.1, chunk_length=250, max_chunks=3, batch_size=8)
    c0, b0, a0 = e.classify_sequences(seqs)
    for hb, depth in ((7, 2), (16, 3), (40, 1)):
        c, b, a = e.classify_sequences_pipelined(seqs, host_batch_reads=hb, depth=depth)
        np.testing.assert_array_equal(c, c0)
        np.testing.assert_array_equal(b, b0)
        np.testing.assert_array_equal(a, a0)


def test_pack4_unpack4_roundtrip():
    import jax.numpy as jnp

    from readbouncer_tpu.classify.fused import (
        pack4_np,
        pack5_np,
        unpack4_jnp,
        unpack5_jnp,
    )

    rng = np.random.default_rng(4)
    enc = rng.integers(0, 4, size=(5, 251)).astype(np.uint8)
    p4 = pack4_np(enc)
    assert p4.shape == (5, -(-251 // 4))
    np.testing.assert_array_equal(np.asarray(unpack4_jnp(jnp.asarray(p4), 251)), enc)
    # base-243 agrees on the same codes
    np.testing.assert_array_equal(
        np.asarray(unpack5_jnp(jnp.asarray(pack5_np(enc)), 251)), enc
    )


def test_result_word_roundtrip():
    import jax.numpy as jnp

    from readbouncer_tpu.classify.fused import _pack_result_jnp, unpack_results_np

    classified = jnp.asarray([True, False, True, False])
    best = jnp.asarray([2, -1, 0, -1], dtype=jnp.int32)
    attempts = jnp.asarray([1, 5, 3, 0], dtype=jnp.int32)
    ok, b, a = unpack_results_np(np.asarray(_pack_result_jnp(classified, best, attempts)))
    np.testing.assert_array_equal(ok, [True, False, True, False])
    np.testing.assert_array_equal(b, [2, -1, 0, -1])
    np.testing.assert_array_equal(a, [1, 5, 3, 0])


def test_packing_fallback_on_n_reads(filters):
    """A host batch containing any N falls back to base-243 packing;
    decisions equal the pure-ACGT 2-bit path's oracle either way."""
    genomes, tf, df = filters
    rng = np.random.default_rng(77)
    seqs = _mixed_reads(genomes, rng, n=24, length=600)
    e = ClassifyEngine(tf, df, error_rate=0.1, chunk_length=250, max_chunks=3, batch_size=8)
    job = e.classify_submit(seqs)
    assert job.packing == "2bit"
    want = job.finish()

    # inject an N into ONE read: the whole batch reroutes to base-243
    seqs_n = list(seqs)
    seqs_n[5] = seqs_n[5][:100] + "N" + seqs_n[5][101:]
    job_n = e.classify_submit(seqs_n)
    assert job_n.packing == "base243"
    got = job_n.finish()
    # all reads except the mutated one decide identically
    keep = np.ones(len(seqs), dtype=bool)
    keep[5] = False
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w[keep], g[keep])
    # and the N-read matches the waves oracle
    cw, bw, aw = e.classify_sequences_waves(seqs_n)
    assert got[0][5] == cw[5] and got[1][5] == bw[5]


def test_packing_pinned_validation(filters):
    genomes, tf, df = filters
    with pytest.raises(ValueError, match="packing"):
        ClassifyEngine(tf, df, error_rate=0.1, packing="3bit")
    e = ClassifyEngine(
        tf, df, error_rate=0.1, chunk_length=250, max_chunks=3,
        batch_size=8, packing="2bit",
    )
    with pytest.raises(ValueError, match="N bases"):
        e.classify_submit(["ACGTN" * 60])
    # max_chunks guard (packed result word gives attempts 8 bits)
    with pytest.raises(ValueError, match="max_chunks"):
        ClassifyEngine(tf, df, error_rate=0.1, max_chunks=300)


def test_reads_longer_than_chunk_budget(filters):
    """Reads longer than max_chunks*chunk_length: only the chunk budget
    is scored (the reference's loop stops at max_chunks) — fused ==
    waves oracle on over-length reads."""
    genomes, tf, df = filters
    rng = np.random.default_rng(41)
    g = genomes["t0"]
    seqs = [
        g[0:2000],                    # 2000 > 3*250: on-target, over budget
        genomes["d"][300:1400],       # deplete-derived, over budget
        "".join("ACGT"[i] for i in rng.integers(0, 4, 950)),  # random, over budget
    ]
    e = ClassifyEngine(tf, df, error_rate=0.1, chunk_length=250, max_chunks=3, batch_size=4)
    want = e.classify_sequences_waves(seqs)
    got = e.classify_sequences(seqs)
    for w, gg in zip(want, got):
        np.testing.assert_array_equal(w, gg)
