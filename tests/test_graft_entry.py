"""Driver contract: dryrun_multichip must work for various device counts
(the driver picks N; the dp x tp factorization must adapt)."""

import numpy as np
import pytest
import jax


@pytest.mark.slow
@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip(n):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(n)  # asserts a finite loss internally
