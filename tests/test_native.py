"""Native (C++) bed codec vs the NumPy reference implementation."""

import numpy as np
import pytest

from rs_bann_tpu.io import native
from rs_bann_tpu.io.bed import BedVM, decode_bed_bytes, pack_genotypes


@pytest.fixture(scope="module")
def bed():
    return BedVM.random(101, 40, seed=3)  # n % 4 != 0 exercises padding


def test_native_builds():
    assert native.available(), "native bedops should build in this image"


def test_decode_matches_numpy(bed):
    np.testing.assert_array_equal(
        native.decode(bed.data, bed.num_individuals),
        decode_bed_bytes(bed.data, bed.num_individuals),
    )


def test_col_stats_match_numpy(bed):
    full = decode_bed_bytes(bed.data, bed.num_individuals)
    m, s = native.col_stats(bed.data, bed.num_individuals)
    np.testing.assert_allclose(m, full.mean(axis=1), rtol=1e-6)
    np.testing.assert_allclose(s, full.std(axis=1), rtol=1e-5)


def test_submatrix_std_matches(bed):
    ixs = [0, 7, 33]
    full = decode_bed_bytes(bed.data, bed.num_individuals)
    got = native.submatrix_std(
        bed.data, bed.num_individuals, ixs, bed.col_means, bed.col_stds
    )
    exp = (full[ixs].T - bed.col_means[ixs]) / bed.col_stds[ixs]
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_pack_round_trip(bed):
    full = decode_bed_bytes(bed.data, bed.num_individuals)
    np.testing.assert_array_equal(native.pack(full), bed.data)
    np.testing.assert_array_equal(pack_genotypes(full), bed.data)


def test_zero_variance_column_maps_to_zero():
    vals = np.ones((1, 8), np.float32)  # constant column
    by = pack_genotypes(vals)
    m, s = native.col_stats(by, 8)
    assert s[0] == 0.0
    out = native.submatrix_std(by, 8, [0], m, s)
    np.testing.assert_array_equal(out, 0.0)
