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


@pytest.mark.slow
def test_dryrun_multichip_bare_subprocess():
    """The driver invokes __graft_entry__ in a bare interpreter — no conftest,
    no XLA_FLAGS, and possibly a TPU plugin that ignores JAX_PLATFORMS
    (MULTICHIP_r01.json regression). dryrun_multichip must self-provision the
    virtual-CPU mesh."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"stderr:\n{proc.stderr[-2000:]}"
    assert "dryrun_multichip ok" in proc.stdout
