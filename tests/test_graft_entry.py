"""Driver-contract tests for __graft_entry__ (the harness compile-checks
entry() single-chip and runs dryrun_multichip on N virtual devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    y = jax.jit(fn)(*args)
    assert y.shape == (1, 384, 384, 3)
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8
    # shallow ViT: same sharding structure per block (TP splits + DP psum),
    # ~4x less XLA-CPU compile than the driver's full-depth run
    g.dryrun_multichip(8, vit_blocks=4, hooks=(1, 3))
