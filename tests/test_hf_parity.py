"""Numerics parity vs Hugging Face transformers: load randomly-initialized
tiny HF models' weights into our native models and compare forward
outputs against the torch reference — the strongest correctness check we
can run hermetically (the reference's ORT-comparison methodology,
docs/debugging.md)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from rten_tpu.models import hf_loader  # noqa: E402
from rten_tpu.models.bert import Bert  # noqa: E402
from rten_tpu.models.transformer import TransformerLM  # noqa: E402

rng = np.random.RandomState(0)


def test_gpt2_parity():
    from transformers import GPT2Config, GPT2LMHeadModel
    hf_cfg = GPT2Config(vocab_size=96, n_positions=64, n_embd=48,
                        n_layer=2, n_head=4,
                        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = hf_loader.gpt2_config_from_hf(hf_cfg)
    params = hf_loader.load_gpt2(hf, cfg)
    model = TransformerLM(cfg)

    ids = rng.randint(0, 96, (2, 10))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got, _ = model.forward(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-3)


def test_gpt2_parity_cached_decode():
    from transformers import GPT2Config, GPT2LMHeadModel
    hf_cfg = GPT2Config(vocab_size=96, n_positions=64, n_embd=48,
                        n_layer=2, n_head=4,
                        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0)
    torch.manual_seed(1)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    cfg = hf_loader.gpt2_config_from_hf(hf_cfg)
    params = hf_loader.load_gpt2(hf, cfg)
    model = TransformerLM(cfg)

    prompt = rng.randint(0, 96, (1, 6))
    cache = model.new_cache(1, capacity=32)
    logits, cache = model.prefill(params, jnp.asarray(prompt, jnp.int32),
                                  cache)
    nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)
    step_logits, cache = model.decode_step(params, nxt, cache)

    full = np.concatenate([prompt, np.asarray(nxt)[:, None]], 1)
    with torch.no_grad():
        want = hf(torch.tensor(full)).logits.numpy()[:, -1]
    np.testing.assert_allclose(np.asarray(step_logits), want, rtol=1e-3,
                               atol=2e-3)


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         max_position_embeddings=64, rms_norm_eps=1e-6,
                         tie_word_embeddings=False,
                         attention_dropout=0.0)
    torch.manual_seed(2)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = hf_loader.llama_config_from_hf(hf_cfg)
    params = hf_loader.load_llama(hf, cfg)
    model = TransformerLM(cfg)

    ids = rng.randint(0, 128, (2, 9))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    got, _ = model.forward(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-3)


def test_bert_parity():
    from transformers import BertConfig as HFBertConfig, BertModel
    hf_cfg = HFBertConfig(vocab_size=120, hidden_size=48,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=96,
                          max_position_embeddings=64,
                          hidden_dropout_prob=0.0,
                          attention_probs_dropout_prob=0.0,
                          hidden_act="gelu")
    torch.manual_seed(3)
    hf = BertModel(hf_cfg).eval()
    cfg = hf_loader.bert_config_from_hf(hf_cfg)
    params = hf_loader.load_bert(hf, cfg)
    model = Bert(cfg)

    ids = rng.randint(0, 120, (2, 8))
    mask = np.ones((2, 8), np.int64)
    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
    want_hidden = out.last_hidden_state.numpy()
    want_pooled = out.pooler_output.numpy()
    got_hidden = model.forward(params, jnp.asarray(ids, jnp.int32),
                               jnp.asarray(mask, jnp.int32))
    got_pooled = model.pooled(params, jnp.asarray(ids, jnp.int32),
                              jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(got_hidden), want_hidden,
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled,
                               rtol=1e-3, atol=2e-3)
