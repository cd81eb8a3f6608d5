"""Autoregressive serving engine — the TPU re-imagining of rten-generate.

The reference's ``Generator`` (rten-generate/src/generator.rs) is an
iterator that feeds a growing KV cache back into a graph each step. Under
XLA, growth means recompilation, so this engine re-architects the loop
around *fixed shapes*:

* :mod:`kv_cache` — preallocated padded caches updated in place via
  ``lax.dynamic_update_slice`` with buffer donation;
* :mod:`generator` — the graph-driven Generator (drop-in parity with the
  reference: KV-input discovery by name, constant-prefix caching,
  attention-mask/position-id synthesis), with bucketed padding to bound
  recompiles;
* :mod:`engine` — the native-model serving engine (jitted prefill +
  decode-step over flash kernels) with continuous batching;
* :mod:`sampler` — argmax / top-k / top-p, computed on device;
* :mod:`metrics`, :mod:`text_decoder` — tokens/s & TTFT accounting,
  incremental UTF-8 decoding.
"""

from .generator import Generator, GeneratorConfig, ModelInputsConfig
from .kv_cache import KVCache
from .metrics import Metrics
from .sampler import ArgMaxSampler, Sampler, TopKSampler, TopPSampler
from .text_decoder import TextDecoder

__all__ = [
    "Generator", "GeneratorConfig", "ModelInputsConfig", "KVCache",
    "Metrics", "Sampler", "ArgMaxSampler", "TopKSampler", "TopPSampler",
    "TextDecoder",
]
