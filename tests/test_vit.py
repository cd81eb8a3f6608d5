"""ViT family tests: patch-embed parity vs torch conv2d, pallas/XLA
attention agreement, classification shapes, DPT depth head."""

import jax
import jax.numpy as jnp
import numpy as np

from rten_tpu.models.vit import (DepthConfig, DepthEstimator, ViT,
                                 ViTConfig)


def test_patch_embedding_matches_torch_conv():
    """Unfold+matmul patch embedding == stride-P conv2d (how HF ViT
    checkpoints store it)."""
    import torch
    import torch.nn.functional as F
    cfg = ViTConfig.tiny_test()
    model = ViT(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)

    ours = np.asarray(jnp.matmul(model.patchify(jnp.asarray(img)),
                                 params["patch_w"]) + params["patch_b"])
    # Torch: conv weight [d, C, P, P] built from our [P*P*C, d] with the
    # matching (p, p, C) unfold order.
    p, c, d = cfg.patch_size, cfg.in_channels, cfg.d_model
    w = np.asarray(params["patch_w"]).reshape(p, p, c, d)
    w_t = torch.tensor(w.transpose(3, 2, 0, 1).copy())
    out_t = F.conv2d(torch.tensor(img), w_t, stride=p)
    out_t = out_t.flatten(2).transpose(1, 2).numpy()  # [B, n_patches, d]
    np.testing.assert_allclose(ours, out_t + np.asarray(params["patch_b"]),
                               rtol=1e-4, atol=1e-5)


def test_vit_classify_shapes_and_determinism():
    cfg = ViTConfig.tiny_test()
    model = ViT(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.RandomState(1).randn(2, 3, 32, 32),
                      jnp.float32)
    logits = model.classify(params, img)
    assert logits.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(model.classify(params, img)),
                               np.asarray(logits), rtol=1e-6)


def test_vit_pallas_matches_reference_attention():
    cfg_p = ViTConfig.tiny_test(use_pallas=True)
    cfg_r = ViTConfig.tiny_test(use_pallas=False)
    params = ViT(cfg_p).init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.RandomState(2).randn(1, 3, 32, 32),
                      jnp.float32)
    a = np.asarray(ViT(cfg_p).classify(params, img))
    b = np.asarray(ViT(cfg_r).classify(params, img))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_vit_mean_pool_mode():
    cfg = ViTConfig.tiny_test(use_cls_token=False)
    model = ViT(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    img = jnp.zeros((1, 3, 32, 32), jnp.float32)
    feats = model.encode(params, img)
    assert feats.shape == (1, cfg.n_patches, cfg.d_model)
    assert model.classify(params, img).shape == (1, 10)


def test_depth_estimator_output():
    cfg = DepthConfig.tiny_test()
    model = DepthEstimator(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    img = jnp.asarray(np.random.RandomState(3).randn(2, 3, 32, 32),
                      jnp.float32)
    depth = model.predict(params, img)
    assert depth.shape == (2, 32, 32)
    # Depth is patch-constant before upsampling: pixels inside one patch
    # vary smoothly (bilinear), and the map is deterministic.
    again = model.predict(params, img)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(again))
    assert np.isfinite(np.asarray(depth)).all()
