import numpy as np

from terastructure_tpu.data import GenotypeData, simulate_psd
from terastructure_tpu.models.psd import MISSING


def test_heldout_sets_excluded_from_training():
    _, _, x = simulate_psd(40, 60, 3, seed=1)
    data = GenotypeData.from_dense(x, validation_frac=0.02, heldout_frac=0.02, seed=1)
    dense = data.dense()
    for es in (data.validation, data.heldout):
        assert len(es) > 0
        # Entries recoded MISSING in the training matrix...
        assert (dense[es.ind_idx, es.snp_idx] == MISSING).all()
        # ...but their true values stored in the set match the source.
        np.testing.assert_array_equal(es.x, x[es.ind_idx, es.snp_idx])
    # Non-heldout entries unchanged.
    mask = np.ones_like(x, dtype=bool)
    for es in (data.validation, data.heldout):
        mask[es.ind_idx, es.snp_idx] = False
    np.testing.assert_array_equal(dense[mask], x[mask])


def test_validation_heldout_disjoint():
    _, _, x = simulate_psd(30, 50, 2, seed=2)
    data = GenotypeData.from_dense(x, validation_frac=0.05, heldout_frac=0.05, seed=2)
    a = set(zip(data.validation.ind_idx.tolist(), data.validation.snp_idx.tolist()))
    b = set(zip(data.heldout.ind_idx.tolist(), data.heldout.snp_idx.tolist()))
    assert not (a & b)


def test_pad_snps():
    _, _, x = simulate_psd(10, 13, 2, seed=3)
    data = GenotypeData.from_dense(x, validation_frac=0, heldout_frac=0, seed=3)
    padded = data.pad_snps(8)
    assert padded.packed.shape[0] == 16
    assert (padded.packed[13:] == 0xFF).all()


def test_simulate_respects_missing_frac():
    _, _, x = simulate_psd(50, 80, 3, missing_frac=0.1, seed=4)
    frac = (x == MISSING).mean()
    assert 0.05 < frac < 0.15
