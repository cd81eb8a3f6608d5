"""Text-to-speech synthesis, VITS/piper-class
(reference example: rten-examples/src/piper.rs).

    python examples/tts_speak.py --text "hello world" --out speech.wav

Pipeline: text → character/phoneme ids → transformer encoder → duration
prediction → length-regulated frames → mel + post-net → conv vocoder →
16-bit PCM .wav. Random weights produce shaped noise (architecture
demo); trained VITS-class weights make it a real voice.
"""

import argparse
import sys
import wave

import numpy as np

sys.path.insert(0, ".")


def text_to_ids(text, vocab_size):
    """Toy char-level 'phonemizer' (piper uses espeak phonemes; the id
    space is what matters for the architecture demo)."""
    return [ord(c) % vocab_size for c in text.lower()]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--text", default="hello tpu")
    parser.add_argument("--out", default=None)
    parser.add_argument("--pace", type=float, default=1.0)
    parser.add_argument("--sample-rate", type=int, default=16000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from rten_tpu.models.tts import TTSConfig, TextToSpeech

    cfg = TTSConfig()
    model = TextToSpeech(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    print("random weights (architecture/pipeline demo)")

    ids = text_to_ids(args.text, cfg.vocab_size)[:cfg.max_phonemes]
    phonemes = np.zeros((1, cfg.max_phonemes), np.int32)
    phonemes[0, :len(ids)] = ids
    lengths = np.asarray([len(ids)], np.int32)

    synth = jax.jit(model.synthesize, static_argnames=("pace",))
    wave_out, n_samples = synth(params, jnp.asarray(phonemes),
                                jnp.asarray(lengths), pace=args.pace)
    n = int(n_samples[0])
    audio = np.asarray(wave_out)[0, :n]
    dur = n / args.sample_rate
    print(f"synthesized {n} samples ({dur:.2f}s at {args.sample_rate} Hz)")

    if args.out:
        pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2")
        with wave.open(args.out, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(args.sample_rate)
            f.writeframes(pcm.tobytes())
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
