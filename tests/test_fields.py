"""Golden parity tests of the hypernetwork + functional field MLP against
an independent torch implementation of the reference semantics
(weight-normalized linears, LayerNorm+exact-GELU between layers,
functional per-instance MLP evaluation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsrd_tpu.models import encoders, hyper_field


def test_field_layer_sizes():
    sizes, num_neurons = hyper_field.field_layer_sizes(48, (16, 16, 16, 16))
    assert sizes == [(48, 16), (16, 16), (16, 16), (16, 16), (16, 1)]
    assert num_neurons == [784, 272, 272, 272, 17]
    assert sum(num_neurons) == 1617


def test_sinusoidal_encoder_matches_torch_reference():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 3)).astype(np.float32)

    # torch golden: reference sinusoidal_encoder.py:14-19 semantics
    tx = torch.from_numpy(x)
    freqs = (2.0 ** torch.arange(8)) * np.pi
    golden = torch.stack(
        [torch.cos(freqs * tx.unsqueeze(-1)), torch.sin(freqs * tx.unsqueeze(-1))],
        dim=-1,
    ).flatten(-3, -1)

    ours = encoders.sinusoidal_encode(jnp.asarray(x), 8)
    assert ours.shape == (5, 48)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=1e-5)


def _torch_hypernet_forward(torch, params, emb):
    """Independent torch re-statement of the hypernetwork forward."""
    x = torch.from_numpy(emb)
    layers = params["layers"]
    for i, layer in enumerate(layers):
        v = torch.from_numpy(np.asarray(layer["v"]))
        g = torch.from_numpy(np.asarray(layer["g"]))
        b = torch.from_numpy(np.asarray(layer["b"]))
        w = v * (g / v.norm(dim=-1)).unsqueeze(-1)
        x = x @ w.T + b
        if i < len(layers) - 1:
            x = torch.nn.functional.layer_norm(
                x,
                [x.shape[-1]],
                torch.from_numpy(np.asarray(layer["ln_scale"])),
                torch.from_numpy(np.asarray(layer["ln_bias"])),
            )
            x = torch.nn.functional.gelu(x)  # exact
    return x


def _torch_field_forward(torch, weights, feats, in_channels, out_list):
    x = torch.from_numpy(feats)
    w = torch.from_numpy(weights)
    ins = [in_channels, *out_list]
    outs = [*out_list, 1]
    sizes = [o * (i + 1) for i, o in zip(ins, outs)]
    chunks = torch.split(w, sizes, dim=-1)
    for idx, (chunk, c_in, c_out) in enumerate(zip(chunks, ins, outs)):
        if idx:
            x = torch.nn.functional.layer_norm(x, [c_in])
            x = torch.nn.functional.gelu(x)
        mat = chunk.unflatten(-1, (c_out, c_in + 1))
        x = torch.einsum(
            "...mn,...n->...m",
            mat,
            torch.nn.functional.pad(x, (0, 1), value=1.0),
        )
    return x


def test_hypernetwork_matches_torch_golden():
    torch = pytest.importorskip("torch")
    key = jax.random.PRNGKey(0)
    params = hyper_field.init_hyper_field(key)
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(3, 256)).astype(np.float32)

    ours = hyper_field.hypernetwork_apply(params, jnp.asarray(emb))
    golden = _torch_hypernet_forward(torch, params, emb)
    assert ours.shape == (3, 1617)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-4)


def test_field_apply_matches_torch_golden():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    n, p = 4, 7
    weights = rng.normal(size=(n, 1617)).astype(np.float32) * 0.3
    feats = rng.normal(size=(n, p, 48)).astype(np.float32)

    ours = hyper_field.field_apply(jnp.asarray(weights), jnp.asarray(feats))
    golden = _torch_field_forward(
        torch, weights[:, None, :].repeat(p, 1), feats, 48, [16, 16, 16, 16]
    )
    assert ours.shape == (n, p, 1)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-4)


def test_weight_norm_init_preserves_effective_weight():
    key = jax.random.PRNGKey(3)
    params = hyper_field.init_hyper_field(key)
    for layer in params["layers"]:
        norms = np.linalg.norm(np.asarray(layer["v"]), axis=-1)
        np.testing.assert_allclose(np.asarray(layer["g"]), norms, rtol=1e-6)


def test_field_apply_is_differentiable_wrt_weights():
    key = jax.random.PRNGKey(4)
    rng = np.random.default_rng(5)
    weights = jnp.asarray(rng.normal(size=(2, 1617)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 3, 48)).astype(np.float32))
    grad = jax.grad(lambda w: jnp.sum(hyper_field.field_apply(w, feats)))(weights)
    assert np.isfinite(np.asarray(grad)).all()


def test_tensorial_encoders():
    from vsrd_tpu.models import encoders

    key = jax.random.PRNGKey(0)
    pos = jnp.asarray(np.random.default_rng(0).uniform(-0.9, 0.9, (7, 3)),
                      jnp.float32)

    cp = encoders.init_tensorial_cp_encoder(key, 12, (9, 9, 9))
    out = encoders.tensorial_cp_encode(cp, pos)
    assert out.shape == (7, 12)
    # differentiable w.r.t. grid and positions
    g = jax.grad(lambda p: jnp.sum(encoders.tensorial_cp_encode(cp, p)))(pos)
    assert np.isfinite(np.asarray(g)).all()

    vm = encoders.init_tensorial_vm_encoder(key, 12, (9, 9, 9))
    out = encoders.tensorial_vm_encode(vm, pos)
    assert out.shape == (7, 12)
    g = jax.grad(lambda p: jnp.sum(encoders.tensorial_vm_encode(vm, p)))(pos)
    assert np.isfinite(np.asarray(g)).all()


def test_hyper_radiance_field_emits_rgb():
    from vsrd_tpu.models import hyper_field

    key = jax.random.PRNGKey(0)
    params = hyper_field.init_hyper_radiance_field(key)
    emb = jnp.zeros((2, 256))
    weights = hyper_field.hypernetwork_apply(params, emb)
    feats = jnp.zeros((2, 5, 48))
    out = hyper_field.field_apply(weights, feats, final_channels=3)
    assert out.shape == (2, 5, 3)
