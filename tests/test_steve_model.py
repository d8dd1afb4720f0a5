"""STEVE model unit tests: shapes, numerics vs torch, AR decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focus_tpu.config import get_cfg


def tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "STEVE"
    cfg.MODEL.CNN_NAME = "base"
    cfg.SLOTS.IMG_SIZE = 32
    cfg.SLOTS.NUM_SLOTS = 3
    cfg.SLOTS.NUM_ITERS = 2
    cfg.SLOTS.SIZE = 16
    cfg.SLOTS.DIM = 16
    cfg.SLOTS.MLP_HID_SIZE = 16
    cfg.SLOTS.CNN_HID_SIZE = 8
    cfg.SLOTS.VOCAB_SIZE = 32
    cfg.SLOTS.NUM_PREDICTOR_BLOCKS = 1
    cfg.SLOTS.NUM_PREDICTOR_HEADS = 2
    cfg.SLOTS.DECODER.NUM_BLOCKS = 1
    cfg.SLOTS.DECODER.NUM_HEADS = 2
    cfg.SLOTS.DECODER.DIM = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.fixture(scope="module")
def steve_setup():
    from focus_tpu.models.build import build_model, init_model

    cfg = tiny_cfg()
    model = build_model(cfg)
    video = jnp.asarray(
        np.random.RandomState(0).rand(2, 3, 32, 32, 3), jnp.float32
    )
    variables = init_model(model, cfg, (video, 1.0, True))
    return cfg, model, video, variables


def test_steve_forward_shapes(steve_setup):
    cfg, model, video, variables = steve_setup
    rngs = {"slots": jax.random.PRNGKey(1), "gumbel": jax.random.PRNGKey(2)}
    recon, ce, mse, attns = model.apply(variables, video, 1.0, True, rngs=rngs)
    assert recon.shape == video.shape
    assert attns.shape == (2, 3, cfg.SLOTS.NUM_SLOTS, 32, 32, 3)
    assert np.isfinite(float(ce)) and np.isfinite(float(mse))
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0


def test_steve_encode_and_ar_decode(steve_setup):
    cfg, model, video, variables = steve_setup
    rngs = {"slots": jax.random.PRNGKey(1)}
    slots, attns_vis, attns = model.apply(
        variables, video, method="encode", rngs=rngs
    )
    assert slots.shape == (2, 3, cfg.SLOTS.NUM_SLOTS, cfg.SLOTS.SIZE)
    recon = model.apply(
        variables, video, method="reconstruct_autoregressive", rngs=rngs
    )
    assert recon.shape == video.shape
    assert np.isfinite(np.asarray(recon)).all()


def test_gumbel_softmax_hard_is_onehot():
    from focus_tpu.models.common import gumbel_softmax

    logits = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 16), jnp.float32)
    y = gumbel_softmax(jax.random.PRNGKey(0), logits, 0.5, True)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)
    assert set(np.unique(np.asarray(y))).issubset({0.0, 1.0})
    y_soft = gumbel_softmax(jax.random.PRNGKey(0), logits, 0.5, False)
    np.testing.assert_allclose(np.asarray(y_soft.sum(-1)), 1.0, rtol=1e-5)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    from focus_tpu.models.steve.dvae import pixel_shuffle

    x = np.random.RandomState(0).randn(2, 16, 3, 4).astype(np.float32)  # NCHW
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    ours = pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_gru_cell_matches_torch():
    torch = pytest.importorskip("torch")
    from focus_tpu.models.common import GRUCell

    rs = np.random.RandomState(0)
    D, H, B = 6, 5, 3
    x = rs.randn(B, D).astype(np.float32)
    h = rs.randn(B, H).astype(np.float32)

    tcell = torch.nn.GRUCell(D, H)
    with torch.no_grad():
        ref = tcell(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    params = {
        "params": {
            "weight_ih": jnp.asarray(tcell.weight_ih.detach().numpy().T),
            "weight_hh": jnp.asarray(tcell.weight_hh.detach().numpy().T),
            "bias_ih": jnp.asarray(tcell.bias_ih.detach().numpy()),
            "bias_hh": jnp.asarray(tcell.bias_hh.detach().numpy()),
        }
    }
    ours = GRUCell(H).apply(params, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_ari_perfect_and_random():
    from focus_tpu.utils.metrics import evaluate_ari, evaluate_mbo

    rs = np.random.RandomState(0)
    # perfect match -> ARI 1
    labels = rs.randint(0, 4, size=(2, 100))
    true = np.stack([(labels == k) for k in range(4)], axis=1).astype(np.float32)
    assert evaluate_ari(true, true.copy()) == pytest.approx(1.0)
    assert evaluate_mbo(true, true.copy()) == pytest.approx(1.0)
    # constant prediction -> ARI ~ 0
    pred = np.zeros_like(true)
    pred[:, 0] = 1.0
    assert abs(evaluate_ari(true, pred)) < 0.05


def test_kv_cached_decode_matches_full(steve_setup):
    """The KV-cached AR rollout must reproduce the full-buffer re-decode
    exactly (argmax sampling; same positions/masks, only op order moves)."""
    cfg, model, video, variables = steve_setup
    rs = np.random.RandomState(3)
    slots = jnp.asarray(
        rs.rand(4, cfg.SLOTS.NUM_SLOTS, cfg.SLOTS.SIZE), jnp.float32
    )
    full = model.apply(variables, slots, method="decode", use_kv_cache=False)
    cached = model.apply(variables, slots, method="decode", use_kv_cache=True)
    np.testing.assert_allclose(
        np.asarray(cached), np.asarray(full), atol=1e-5
    )
