"""Grid-sharded posterior ops vs single-device references (8 CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from targetvae_tpu.parallel.grid_softmax import make_sharded_posterior
from targetvae_tpu.parallel.mesh import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_posterior_matches_reference():
    mesh = make_mesh(jax.devices()[:8], data=1, model=8)
    B, M, D = 4, 64 * 8, 3
    attn = jax.random.normal(jax.random.key(0), (B, M)) * 3.0
    z = jax.random.normal(jax.random.key(1), (B, M, D))
    key = jax.random.key(2)

    fn = make_sharded_posterior(mesh)
    q, a, ez = fn(attn, key, z)

    # q must equal the global log_softmax exactly
    q_ref = jax.nn.log_softmax(attn, axis=-1)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), atol=1e-5)

    # a is a valid distribution over the full grid
    np.testing.assert_allclose(np.asarray(jnp.sum(a, axis=-1)), 1.0,
                               atol=1e-5)
    # moments consistent with the sample it returned
    ez_ref = jnp.einsum("bm,bmd->bd", a, z)
    np.testing.assert_allclose(np.asarray(ez), np.asarray(ez_ref), atol=1e-5)


def test_sharded_posterior_grad_flows():
    mesh = make_mesh(jax.devices()[:8], data=1, model=8)
    B, M = 2, 16 * 8
    attn = jax.random.normal(jax.random.key(0), (B, M))
    z = jax.random.normal(jax.random.key(1), (B, M, 2))
    fn = make_sharded_posterior(mesh)

    def loss(attn):
        q, a, ez = fn(attn, jax.random.key(2), z)
        return jnp.sum(q * jnp.exp(q)) + jnp.sum(ez ** 2)

    g = jax.grad(loss)(attn)
    assert np.isfinite(np.asarray(g)).all()


def test_sp_posterior_kernel_matches_jnp_reference():
    """The per-shard Pallas posterior (kernels/posterior.py SP variant +
    parallel/grid_softmax.sp_posterior_kernel collectives), interpret mode,
    vs a direct unsharded jnp transcription — fwd and grads."""
    import functools

    from targetvae_tpu.parallel import grid_softmax as GS
    import targetvae_tpu.kernels.posterior as PK

    mesh = make_mesh(jax.devices()[:4], data=1, model=4)
    B, C, zd = 3, 4096, 2            # 4 shards x 1024 cells
    sig_r = float(np.pi / 4)
    ks = jax.random.split(jax.random.key(0), 8)
    attn = jax.random.normal(ks[0], (B, C)) * 2.0
    noise = jax.random.gumbel(ks[1], (B, C))
    th = jax.random.normal(ks[2], (B, 2, C)) * 0.5
    z = jax.random.normal(ks[3], (B, 2, zd, C)) * 0.5
    p = jax.nn.log_softmax(jax.random.normal(ks[4], (C,)))
    gx = jax.random.normal(ks[5], (C,))
    gy = jax.random.normal(ks[6], (C,))
    offs = jax.random.normal(ks[7], (C,)) * 0.3

    EPS = 1e-6

    def ref(attn, th, z):
        q = jax.nn.log_softmax(attn, axis=-1)
        eq = jnp.exp(q)
        a = jax.nn.softmax(attn + noise, axis=-1)
        th_mu, th_ls = th[:, 0], th[:, 1]
        th_std = jnp.exp(th_ls) + EPS
        dead = eq == 0
        tq_mu = jnp.where(dead, 0.0, th_mu)
        tq_std = jnp.where(dead, 1.0, th_std)
        kl_th = (jnp.log(sig_r / tq_std)
                 + (tq_std ** 2 + (tq_mu - offs) ** 2) / (2 * sig_r ** 2)
                 - 0.5)
        kl = jnp.sum(eq * (q - p), 1)
        outs = []
        kl_z = jnp.zeros_like(attn)
        for d in range(zd):
            zm, zs = z[:, 0, d], jnp.exp(z[:, 1, d]) + EPS
            outs.append(jnp.sum(a * zm, 1))
            zq_mu = jnp.where(dead, 0.0, zm)
            zq_std = jnp.where(dead, 1.0, zs)
            kl_z = kl_z + (-jnp.log(zq_std)
                           + 0.5 * (zq_std ** 2 + zq_mu ** 2) - 0.5)
        for d in range(zd):
            outs.append(jnp.sum(a * (jnp.exp(z[:, 1, d]) + EPS), 1))
        outs += [jnp.sum(a * th_mu, 1), jnp.sum(a * th_std, 1),
                 jnp.sum(a * gx, 1), jnp.sum(a * gy, 1),
                 kl + jnp.sum(eq * (kl_th + kl_z), 1)]
        return jnp.stack(outs, axis=1)           # (B, 2zd+5)

    # route the kernels through interpret mode on CPU
    orig = PK.posterior_shard_partials

    def _interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    PK.posterior_shard_partials = _interp
    try:
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map as sm
            kw = {"check_vma": False}
        except ImportError:
            from jax.experimental.shard_map import shard_map as sm
            kw = {"check_rep": False}

        def sharded(attn, th, z):
            def inner(attn, noise, th, z, p, gx, gy, offs):
                return GS.sp_posterior_kernel(
                    "model", sig_r, zd, False,
                    attn, noise, th, z, p, gx, gy, offs)
            f = sm(inner, mesh=mesh,
                   in_specs=(P(None, "model"), P(None, "model"),
                             P(None, None, "model"),
                             P(None, None, None, "model"),
                             P("model"), P("model"), P("model"), P("model")),
                   out_specs=P(), **kw)
            return f(attn, noise, th, z, p, gx, gy, offs)

        y_ref = ref(attn, th, z)
        y_sp = sharded(attn, th, z)
        np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)

        loss = lambda f: lambda a_, t_, z_: jnp.sum(jnp.sin(f(a_, t_, z_)))
        gr = jax.grad(loss(ref), argnums=(0, 1, 2))(attn, th, z)
        gk = jax.grad(loss(sharded), argnums=(0, 1, 2))(attn, th, z)
        for a_, b_ in zip(gr, gk):
            assert np.isfinite(np.asarray(b_)).all()
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a_),
                                       rtol=1e-4, atol=1e-5)
    finally:
        PK.posterior_shard_partials = orig


def test_sp_posterior_kernel_dead_cell_padding():
    """-1e30 padded cells must contribute exactly zero to every partial and
    produce finite grads (the elbo.py SP padding contract)."""
    import functools

    from targetvae_tpu.parallel import grid_softmax as GS
    import targetvae_tpu.kernels.posterior as PK

    mesh = make_mesh(jax.devices()[:4], data=1, model=4)
    B, C, zd = 2, 4096, 1
    live = 1500                       # cells 1500..4095 are pads
    ks = jax.random.split(jax.random.key(1), 4)
    attn = jax.random.normal(ks[0], (B, C))
    attn = attn.at[:, live:].set(-1e30)
    noise = jnp.zeros((B, C))
    th = jax.random.normal(ks[1], (B, 2, C)) * 0.3
    z = jax.random.normal(ks[2], (B, 2, zd, C)) * 0.3
    p = jnp.where(jnp.arange(C) < live,
                  jax.nn.log_softmax(jnp.zeros(live)).mean(), -1e30)
    p = jax.nn.log_softmax(jnp.where(jnp.arange(C) < live, 0.0, -1e30))
    gx = gy = jnp.zeros((C,))
    offs = jnp.zeros((C,))

    orig = PK.posterior_shard_partials

    def _interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    PK.posterior_shard_partials = _interp
    try:
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map as sm
            kw = {"check_vma": False}
        except ImportError:
            from jax.experimental.shard_map import shard_map as sm
            kw = {"check_rep": False}

        def run(attn, th, z):
            def inner(attn, noise, th, z, p, gx, gy, offs):
                return GS.sp_posterior_kernel("model", 1.0, zd, False,
                                              attn, noise, th, z, p, gx, gy,
                                              offs)
            f = sm(inner, mesh=mesh,
                   in_specs=(P(None, "model"), P(None, "model"),
                             P(None, None, "model"),
                             P(None, None, None, "model"),
                             P("model"), P("model"), P("model"), P("model")),
                   out_specs=P(), **kw)
            return f(attn, noise, th, z, p, gx, gy, offs)

        out = run(attn, th, z)
        assert np.isfinite(np.asarray(out)).all()
        g = jax.grad(lambda a_, t_, z_: jnp.sum(run(a_, t_, z_)),
                     argnums=(0, 1, 2))(attn, th, z)
        for v in g:
            assert np.isfinite(np.asarray(v)).all()
        # pad cells must receive zero gradient
        assert np.abs(np.asarray(g[0])[:, live:]).max() == 0.0
    finally:
        PK.posterior_shard_partials = orig
