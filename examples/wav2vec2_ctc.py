"""Speech recognition, wav2vec2-style: acoustic frames → bidirectional
transformer encoder → per-frame character logits → CTC decoding
(reference example: rten-examples/src/wav2vec2.rs).

    python examples/wav2vec2_ctc.py [--wav audio.wav] [--beam 0|N]

Without --wav a synthetic tone is transcribed (architecture demo with
random weights). The pipeline is the real one: waveform → log-mel
frontend (models/encoder_decoder.log_mel_spectrogram) → encoder
(models/bert.Bert used as the acoustic encoder — same bidirectional
block) → CTC greedy or prefix-beam decode (rten_tpu/ctc.py, the analog
of the reference's src/ctc.rs).
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

VOCAB = ["<blank>", "|", "e", "t", "a", "o", "n", "i", "h", "s", "r",
         "d", "l", "u", "m", "w", "c", "f", "g", "y", "p", "b", "v",
         "k", "'", "x", "j", "q", "z"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav", default=None)
    parser.add_argument("--beam", type=int, default=0,
                        help="0 = greedy, else CTC prefix beam width")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rten_tpu.ctc import ctc_beam_search_decode, ctc_greedy_decode
    from rten_tpu.models.bert import Bert, BertConfig
    from rten_tpu.models.encoder_decoder import log_mel_spectrogram

    if args.wav:
        import wave
        with wave.open(args.wav) as f:
            sr = f.getframerate()
            audio = np.frombuffer(f.readframes(f.getnframes()),
                                  np.int16).astype(np.float32) / 32768.0
    else:
        print("using a synthetic tone (pass --wav for real audio)")
        sr = 16000
        t = np.arange(sr, dtype=np.float32) / sr
        audio = 0.1 * np.sin(2 * np.pi * 440 * t)

    n_mels = 64
    mel = log_mel_spectrogram(audio, sample_rate=sr, n_mels=n_mels)
    frames = mel.shape[0]

    # Acoustic encoder: bidirectional transformer over frames with a CTC
    # head; vocab includes the blank at index 0.
    cfg = BertConfig(vocab_size=len(VOCAB), n_layers=4, n_heads=4,
                     d_model=256, d_ff=1024, max_seq_len=frames + 8)
    model = Bert(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    params["mel_proj"] = jnp.asarray(
        rng.standard_normal((n_mels, cfg.d_model), dtype=np.float32) * 0.05)
    params["ctc_head"] = jnp.asarray(
        rng.standard_normal((cfg.d_model, len(VOCAB)),
                            dtype=np.float32) * 0.05)
    print("using random weights (demo pipeline)")

    @jax.jit
    def logits_fn(params, mel):
        x = jnp.matmul(mel, params["mel_proj"])[None]       # [1, T, d]
        feats = model.encode_embeddings(params, x)
        return jnp.matmul(feats, params["ctc_head"])[0]     # [T, V]

    t0 = time.perf_counter()
    logits = np.asarray(logits_fn(params, jnp.asarray(mel)))
    elapsed = time.perf_counter() - t0

    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    if args.beam:
        hyp = ctc_beam_search_decode(log_probs, beam_size=args.beam)[0]
    else:
        hyp = ctc_greedy_decode(log_probs)
    ids = hyp.labels()
    text = "".join(VOCAB[i] for i in ids).replace("|", " ")
    print(f"frames={frames} -> {len(ids)} symbols in {elapsed:.2f} s "
          f"(incl. compile); score {hyp.score:.1f}")
    print("transcript:", repr(text[:120]))


if __name__ == "__main__":
    main()
