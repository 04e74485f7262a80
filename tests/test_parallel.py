"""Multi-device tests on the virtual 8-CPU mesh: sharded train step,
spatial (halo-exchange) sharding, and the graft entry points."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from superslomo_tpu.parallel.mesh import batch_sharding, make_mesh, replicated


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}
    mesh1 = make_mesh(n_spatial=1)
    assert mesh1.shape == {"data": 8, "spatial": 1}


def test_batch_sharded_forward():
    from superslomo_tpu.config import ModelSpec
    from superslomo_tpu.models.superslomo import SuperSloMo

    mesh = make_mesh(n_spatial=1)
    model = SuperSloMo(spec=ModelSpec(n_frames=2))
    B, H, W = 8, 32, 32
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((B, 2, H, W, 3), dtype=np.float32))
    t = jnp.full((B, 1), 0.5)
    params = model.init(jax.random.PRNGKey(0), frames[:1], t[:1])

    data_sh = batch_sharding(mesh)
    repl = replicated(mesh)
    fwd = jax.jit(
        lambda p, f, tt: model.apply(p, f, tt).pred_images,
        in_shardings=(repl, data_sh, data_sh),
        out_shardings=data_sh,
    )
    frames_sh = jax.device_put(frames, data_sh)
    t_sh = jax.device_put(t, data_sh)
    out = fwd(params, frames_sh, t_sh)
    assert out.shape == (B, 1, H, W, 3)
    # sharded result equals single-device result
    ref = model.apply(params, frames, t).pred_images
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[1] == 7  # 7 intermediate frames
    assert np.isfinite(np.asarray(out)).all()
