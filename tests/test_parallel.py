"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple (virtual) devices")
class TestMultichip:
    def test_dryrun_two_devices(self):
        from eggfusion_tpu.parallel.mesh import run_multichip_dryrun

        run_multichip_dryrun(2)

    def test_dryrun_eight_devices(self):
        from eggfusion_tpu.parallel.mesh import run_multichip_dryrun

        run_multichip_dryrun(min(8, len(jax.devices())))

    def test_graft_entry_contract(self):
        import __graft_entry__ as ge

        fn, args = ge.entry()
        loss = jax.jit(fn)(*args)
        assert np.isfinite(float(loss))
