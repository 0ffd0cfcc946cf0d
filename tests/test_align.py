"""Alignment DP vs NumPy oracle, all three edlib modes + IUPAC + traceback."""

import numpy as np
import pytest

import jax.numpy as jnp

from ratatosk_tpu import dna
from ratatosk_tpu.ops import align as A
from ratatosk_tpu.ops import cigar as C


def oracle_matrix(a, b, mode):
    m, n = len(a), len(b)
    E = np.zeros((m + 1, n + 1), dtype=np.int64)
    E[0] = 0 if mode == A.HW else np.arange(n + 1)
    E[:, 0] = np.arange(m + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            sub = 0 if (a[i - 1] & b[j - 1]) else 1
            E[i, j] = min(E[i - 1, j - 1] + sub, E[i - 1, j] + 1, E[i, j - 1] + 1)
    return E


def rand_masks(rng, n):
    return dna.codes_to_masks(rng.integers(0, 4, size=n).astype(np.uint8))


def pad_to(x, n):
    out = np.zeros(n, dtype=np.uint8)
    out[:len(x)] = x
    return out


@pytest.mark.parametrize("mode", [A.NW, A.SHW, A.HW])
def test_edit_distance_vs_oracle(mode):
    rng = np.random.default_rng(20)
    M, N, B = 24, 32, 12
    a_l = rng.integers(1, M + 1, size=B)
    b_l = rng.integers(1, N + 1, size=B)
    a = np.stack([pad_to(rand_masks(rng, l), M) for l in a_l])
    b = np.stack([pad_to(rand_masks(rng, l), N) for l in b_l])
    res = A.edit_distance(jnp.asarray(a), jnp.asarray(a_l), jnp.asarray(b), jnp.asarray(b_l), mode)
    for i in range(B):
        E = oracle_matrix(a[i, :a_l[i]], b[i, :b_l[i]], mode)
        if mode == A.NW:
            assert int(res.dist[i]) == E[-1, -1]
        else:
            last = E[a_l[i]]
            assert int(res.dist[i]) == last.min()
            ties = np.flatnonzero(last == last.min())
            assert int(res.end[i]) == ties.max()
            assert int(res.end_min[i]) == ties.min()


def test_iupac_matching():
    # N in the target matches any query base; R matches A/G only
    a = dna.encode_masks("ACGT")
    b = dna.encode_masks("NNNN")
    res = A.edit_distance(jnp.asarray(a[None]), jnp.asarray([4]),
                          jnp.asarray(b[None]), jnp.asarray([4]), A.NW)
    assert int(res.dist[0]) == 0
    b2 = dna.encode_masks("RRRR")
    res2 = A.edit_distance(jnp.asarray(a[None]), jnp.asarray([4]),
                           jnp.asarray(b2[None]), jnp.asarray([4]), A.NW)
    assert int(res2.dist[0]) == 2  # C,T mismatch R


def test_extend_rows_incremental_matches_full():
    rng = np.random.default_rng(21)
    B, M, N = 6, 20, 30
    a = np.stack([rand_masks(rng, M) for _ in range(B)])
    b = np.stack([rand_masks(rng, N) for _ in range(B)])
    row = A.row_init(B, N, A.NW)
    for i in range(M):
        row = A.extend_rows(row, jnp.asarray(a[:, i]), jnp.asarray(b),
                            jnp.full((B,), i + 1, jnp.int32))
    full = A.edit_distance(jnp.asarray(a), jnp.asarray(np.full(B, M)),
                           jnp.asarray(b), jnp.asarray(np.full(B, N)), A.NW)
    np.testing.assert_array_equal(np.asarray(row)[:, -1], np.asarray(full.dist))


@pytest.mark.parametrize("mode", [C.NW, C.SHW, C.HW])
def test_traceback_consistency(mode):
    rng = np.random.default_rng(22)
    for _ in range(10):
        a = rand_masks(rng, int(rng.integers(5, 40)))
        b = rand_masks(rng, int(rng.integers(5, 50)))
        dist, cig, b0, b1 = C.traceback(a, b, mode)
        E = oracle_matrix(a, b, mode)
        assert dist == E[-1].min() if mode != C.NW else dist == E[-1, -1]
        # CIGAR consumes exactly the query and the b0..b1 target span
        qc = sum(ln for op, ln in cig if op in "=XI")
        tc = sum(ln for op, ln in cig if op in "=XD")
        assert qc == len(a)
        assert tc == b1 - b0
        # edit ops count == dist
        assert sum(ln for op, ln in cig if op in "XID") == dist
        # '=' runs really match under IUPAC
        i, j = 0, b0
        for op, ln in cig:
            if op == "=":
                assert ((a[i:i + ln] & b[j:j + ln]) != 0).all()
            if op in "=X":
                i += ln
                j += ln
            elif op == "I":
                i += ln
            else:
                j += ln


def test_colorset_ops():
    from ratatosk_tpu.ops import colorset as CS
    rows_a, card_a = CS.make_rows([[1, 5, 9], [2, 4], []], 4)
    rows_b, card_b = CS.make_rows([[5, 9, 11], [1, 3], [7]], 4)
    cnt = CS.intersect_count(rows_a, rows_b, np)
    np.testing.assert_array_equal(cnt, [2, 0, 0])
    cnt_j = CS.intersect_count(jnp.asarray(rows_a), jnp.asarray(rows_b), jnp)
    np.testing.assert_array_equal(np.asarray(cnt_j), [2, 0, 0])
    inter = CS.intersect_rows(rows_a, rows_b, np)
    assert list(inter[0][:2]) == [5, 9]
    uni = CS.union_rows(rows_a, rows_b, np, 6)
    assert list(uni[0][:5]) == [1, 5, 9, 11, CS.PAD]


def test_error_rate_oracle_matches_dp():
    from tests import sim
    rng = np.random.default_rng(23)
    a = rng.integers(0, 4, size=30).astype(np.uint8)
    b = rng.integers(0, 4, size=35).astype(np.uint8)
    am, bm = dna.codes_to_masks(a), dna.codes_to_masks(b)
    E = oracle_matrix(am, bm, A.NW)
    assert abs(sim.error_rate(a, b) - E[-1, -1] / len(b)) < 1e-9
