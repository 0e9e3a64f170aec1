"""upsample_linear must bit-match torch F.interpolate(linear, align_corners=False)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ddsp_tpu.ops.interp import upsample_linear


@pytest.mark.parametrize("hop", [2, 4, 8, 512])
@pytest.mark.parametrize("t", [1, 2, 7, 172])
def test_matches_torch_interpolate(hop, t):
    if hop == 512 and t > 7:
        t = 16  # keep test fast
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, t, 5)).astype(np.float32)
    got = np.asarray(upsample_linear(x, hop))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 2, 1),
            scale_factor=hop,
            mode="linear",
        )
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_constant_preserved():
    x = np.full((1, 4, 1), 3.25, np.float32)
    y = np.asarray(upsample_linear(x, 16))
    np.testing.assert_allclose(y, 3.25, rtol=0, atol=1e-6)
