"""BERT-family encoder (reference examples: bert_qa.rs,
jina_similarity.rs; BASELINE config 3 = BERT-base dynamic INT8).

Encoder-only transformer with token/position/segment embeddings,
post-layer-norm blocks (original BERT ordering), pooler, and QA span
head. Weights quantize through the shared ``quantize_weights`` transform
(dynamic-INT8 MatMuls via the Pallas kernel)."""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.attention import _attn_reference
from .transformer import linear


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    n_layers: int = 12
    n_heads: int = 12
    d_model: int = 768
    d_ff: int = 3072
    max_seq_len: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self):
        return self.d_model // self.n_heads

    @staticmethod
    def tiny_test(**kw):
        return BertConfig(**{**dict(vocab_size=100, n_layers=2, n_heads=4,
                                    d_model=64, d_ff=128, max_seq_len=64),
                             **kw})


class Bert:
    def __init__(self, config: BertConfig):
        self.config = config

    def init_params(self, key) -> dict:
        cfg = self.config
        rng = np.random.RandomState(0)
        d, dff = cfg.d_model, cfg.d_ff

        def dense(*shape):
            return (rng.randn(*shape) * 0.02).astype(np.float32)

        params = {
            "tok_embed": dense(cfg.vocab_size, d),
            "pos_embed": dense(cfg.max_seq_len, d),
            "type_embed": dense(cfg.type_vocab_size, d),
            "embed_ln_scale": np.ones(d, np.float32),
            "embed_ln_bias": np.zeros(d, np.float32),
            "pooler_w": dense(d, d),
            "pooler_b": np.zeros(d, np.float32),
            "qa_w": dense(d, 2),
            "qa_b": np.zeros(2, np.float32),
            "layers": [],
        }
        for _ in range(cfg.n_layers):
            params["layers"].append({
                "wq": dense(d, d), "bq": np.zeros(d, np.float32),
                "wk": dense(d, d), "bk": np.zeros(d, np.float32),
                "wv": dense(d, d), "bv": np.zeros(d, np.float32),
                "wo": dense(d, d), "bo": np.zeros(d, np.float32),
                "attn_ln_scale": np.ones(d, np.float32),
                "attn_ln_bias": np.zeros(d, np.float32),
                "w_up": dense(d, dff), "b_up": np.zeros(dff, np.float32),
                "w_down": dense(dff, d), "b_down": np.zeros(d, np.float32),
                "mlp_ln_scale": np.ones(d, np.float32),
                "mlp_ln_bias": np.zeros(d, np.float32),
            })
        return jax.tree_util.tree_map(jnp.asarray, params)

    def _ln(self, x, scale, bias):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(
            var + self.config.layer_norm_eps) * scale + bias

    def forward(self, params, input_ids, attention_mask=None,
                token_type_ids=None):
        """Returns per-token hidden states [B, S, d]."""
        cfg = self.config
        b, s = input_ids.shape
        x = jnp.take(params["tok_embed"], input_ids, axis=0)
        x = x + params["pos_embed"][None, :s]
        if token_type_ids is not None:
            x = x + jnp.take(params["type_embed"], token_type_ids, axis=0)
        else:
            x = x + params["type_embed"][0]
        x = self._ln(x, params["embed_ln_scale"], params["embed_ln_bias"])

        lengths = None
        if attention_mask is not None:
            lengths = jnp.sum(attention_mask.astype(jnp.int32), axis=-1)
        return self.encode_embeddings(params, x, lengths=lengths)

    def encode_embeddings(self, params, x, lengths=None):
        """Run the encoder stack over pre-computed embeddings [B, S, d]
        (lets the same bidirectional blocks serve non-token inputs, e.g.
        acoustic frames in the wav2vec2-CTC example)."""
        cfg = self.config
        b, s, _ = x.shape
        for layer in params["layers"]:
            q = linear(x, layer["wq"], layer["bq"])
            k = linear(x, layer["wk"], layer["bk"])
            v = linear(x, layer["wv"], layer["bv"])

            def heads(t):
                return t.reshape(b, s, cfg.n_heads, cfg.head_dim) \
                        .transpose(0, 2, 1, 3)

            # Right-padded masks reduce to per-sequence lengths, which the
            # reference attention path supports directly.
            out = _attn_reference(heads(q), heads(k), heads(v), False,
                                  1.0 / math.sqrt(cfg.head_dim), lengths)
            out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.d_model)
            attn = linear(out, layer["wo"], layer["bo"])
            x = self._ln(x + attn, layer["attn_ln_scale"],
                         layer["attn_ln_bias"])
            h = jax.nn.gelu(linear(x, layer["w_up"], layer["b_up"]),
                            approximate=False)
            mlp = linear(h, layer["w_down"], layer["b_down"])
            x = self._ln(x + mlp, layer["mlp_ln_scale"],
                         layer["mlp_ln_bias"])
        return x

    def pooled(self, params, input_ids, attention_mask=None):
        """[CLS] pooler output (classification / similarity embedding)."""
        hidden = self.forward(params, input_ids, attention_mask)
        return jnp.tanh(linear(hidden[:, 0], params["pooler_w"],
                               params["pooler_b"]))

    def qa_spans(self, params, input_ids, attention_mask=None,
                 token_type_ids=None):
        """(start_logits, end_logits) for extractive QA (bert_qa.rs);
        ``token_type_ids`` separates question (0) from context (1)."""
        hidden = self.forward(params, input_ids, attention_mask,
                              token_type_ids=token_type_ids)
        logits = linear(hidden, params["qa_w"], params["qa_b"])
        return logits[..., 0], logits[..., 1]

    def mean_embedding(self, params, input_ids, attention_mask=None):
        """Mean-pooled sentence embedding (jina_similarity.rs)."""
        hidden = self.forward(params, input_ids, attention_mask)
        if attention_mask is None:
            return jnp.mean(hidden, axis=1)
        mask = attention_mask[..., None].astype(hidden.dtype)
        return jnp.sum(hidden * mask, axis=1) / jnp.maximum(
            jnp.sum(mask, axis=1), 1.0)
