"""Driver entry points stay healthy: entry() compiles, dryrun runs on CPUs."""

import jax
import numpy as np


def test_dryrun_multichip_on_cpu_mesh():
    import __graft_entry__ as g

    g.dryrun_multichip(4)  # virtual CPU devices (conftest pins cpu platform)


def test_entry_shapes():
    import __graft_entry__ as g

    fn, args = g.entry()
    params, img1, img2 = args
    assert img1.shape == (1, 224, 224, 3)
    # don't run the full ViT-L on CPU — just check abstract evaluation
    out_shapes = jax.eval_shape(fn, params, img1, img2)
    pts3d, conf, pts3d_other = out_shapes
    assert pts3d.shape == (1, 224, 224, 3)
    assert conf.shape == (1, 224, 224)
    assert pts3d_other.shape == (1, 224, 224, 3)
