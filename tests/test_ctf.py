"""Direct CTF-synthesis parity oracles vs the reference (src/ctf.py:6-55).

test_elbo.py feeds BOTH frameworks kernels built by this repo's own
ctf_filter, so a synthesis bug there would cancel out; these tests compare
the vectorized synthesis against a direct import of the reference module.
"""

import io

import numpy as np
import pytest

from targetvae_tpu.data.ctf import compute_2d_ctf, ctf_filter, parse_ctf
from tests.conftest import requires_reference
from tests.helpers import import_reference_module


def _params_text():
    # defocus cs voltage apix bfactor ampcont dfdiff dfang
    # multiple rows, astigmatism angle != 0, varied B-factor / amp contrast
    return "\n".join([
        "2.5 2.0 300 1.2 0.0 10 0.1 0.0",
        "1.1 2.7 200 0.66 50.0 7 0.0 33.0",
        "3.9 2.0 300 1.0 120.0 10 0.3 121.5",
        "0.8 1.4 120 2.1 10.0 15 0.2 275.0",
    ])


@requires_reference
def test_parse_ctf_matches_reference(tmp_path):
    ref_ctf = import_reference_module("src.ctf")
    p = tmp_path / "params.txt"
    p.write_text(_params_text())
    ours = parse_ctf(str(p))
    theirs = ref_ctf.parse_ctf(str(p))
    assert list(ours.columns) == list(theirs.columns)
    np.testing.assert_array_equal(ours.to_numpy(), theirs.to_numpy())


@requires_reference
@pytest.mark.parametrize("bfactor", [None, 80.0])
def test_compute_2d_ctf_matches_reference(bfactor):
    """Scalar-parameter evaluation, with astigmatism (dfu != dfv, dfang != 0)."""
    ref_ctf = import_reference_module("src.ctf")
    rng = np.random.RandomState(0)
    freqs = rng.uniform(-0.5, 0.5, size=(400, 2)).astype(np.float64)
    kwargs = dict(dfu=21000.0, dfv=24000.0, dfang=0.71, volt=300.0,
                  cs=2.7, w=0.1, bfactor=bfactor)
    ours = compute_2d_ctf(freqs, **kwargs)
    theirs = ref_ctf.compute_2d_ctf(freqs, **kwargs)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


@requires_reference
@pytest.mark.parametrize("n,m,scale", [(32, 32, 1.0), (33, 33, 1.0),
                                       (40, 28, 0.5)])
def test_ctf_filter_matches_reference(n, m, scale):
    """Batched kernel synthesis vs the reference's per-particle loop."""
    ref_ctf = import_reference_module("src.ctf")
    params = parse_ctf(io.StringIO(_params_text()))
    ours = ctf_filter(params, n, m, scale=scale)
    theirs = ref_ctf.ctf_filter(params, n, m, scale=scale)
    assert ours.shape == theirs.shape == (4, n, m)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-7)


def test_ctf_filter_kernel_properties():
    """Kernels are real, finite, and centro-symmetric for dfang=0 rows."""
    params = parse_ctf(io.StringIO("2.5 2.0 300 1.2 0.0 10 0.0 0.0"))
    k = ctf_filter(params, 33, 33)
    assert np.all(np.isfinite(k))
    # even CTF spectrum -> real-space kernel symmetric under point reflection
    np.testing.assert_allclose(k[0], k[0, ::-1, ::-1], atol=1e-6)
