import numpy as np
import pytest

from cra5_tpu.entropy.cdf import pmf_to_quantized_cdf, build_cdf_table


def check_invariants(cdf, precision=16):
    assert cdf[0] == 0
    assert cdf[-1] == (1 << precision)
    assert np.all(np.diff(cdf) > 0), "cdf must be strictly increasing"


def test_uniform_pmf():
    cdf = pmf_to_quantized_cdf([0.25, 0.25, 0.25, 0.25])
    check_invariants(cdf)
    freqs = np.diff(cdf)
    assert np.all(freqs == 16384)


def test_zero_prob_symbol_gets_repaired():
    cdf = pmf_to_quantized_cdf([0.5, 0.0, 0.5])
    check_invariants(cdf)
    freqs = np.diff(cdf)
    assert freqs[1] >= 1


def test_tiny_probs_steal():
    pmf = [1e-9, 0.9999, 1e-9, 1e-9]
    cdf = pmf_to_quantized_cdf(pmf)
    check_invariants(cdf)
    assert np.all(np.diff(cdf) >= 1)


def test_many_random_pmfs(rng):
    for _ in range(200):
        n = rng.integers(2, 64)
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum() * rng.uniform(1.0, 1.2)  # leave some tail mass
        cdf = pmf_to_quantized_cdf(pmf)
        check_invariants(cdf)
        assert len(cdf) == n + 1


def test_rejects_negative():
    with pytest.raises(ValueError):
        pmf_to_quantized_cdf([0.5, -0.1, 0.6])


def test_rejects_nan():
    with pytest.raises(ValueError):
        pmf_to_quantized_cdf([0.5, float("nan")])


def test_rounding_matches_c_semantics():
    # 0.5 ties round away from zero (std::round), not to even (numpy default)
    pmf = np.array([1.5 / 65536, 2.5 / 65536, 0.9], dtype=np.float32)
    cdf = pmf_to_quantized_cdf(pmf.tolist())
    check_invariants(cdf)


def test_build_cdf_table_rows():
    pmfs = np.array([[0.4, 0.4, 0.0], [0.3, 0.3, 0.3]], dtype=np.float32)
    tails = np.array([0.2, 0.1], dtype=np.float32)
    lengths = np.array([2, 3])
    table = build_cdf_table(pmfs, tails, lengths)
    assert table.quantized_cdf.shape == (2, 5)
    assert table.cdf_length.tolist() == [4, 5]
    for i in range(2):
        row = table.quantized_cdf[i, : table.cdf_length[i]]
        check_invariants(row)
    table.validate()
