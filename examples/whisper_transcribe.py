"""Whisper-class speech-to-text with the encoder-decoder engine
(reference examples: piper.rs / wav2vec2.rs; BASELINE config 4).

    python examples/whisper_transcribe.py [audio.wav]

Without real weights this demonstrates the full pipeline shape: waveform
→ log-mel features → encoder → cross-attention KV → cached greedy decode.
"""

import argparse
import sys
import wave

import numpy as np

sys.path.insert(0, ".")


def read_wav(path):
    with wave.open(path, "rb") as f:
        frames = f.readframes(f.getnframes())
        audio = np.frombuffer(frames, dtype=np.int16).astype(np.float32)
        audio /= 32768.0
        if f.getnchannels() > 1:
            audio = audio.reshape(-1, f.getnchannels()).mean(1)
        return audio, f.getframerate()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("audio", nargs="?", default=None)
    parser.add_argument("--max-tokens", type=int, default=24)
    args = parser.parse_args()

    import jax
    from rten_tpu.models.encoder_decoder import (EncoderDecoderConfig,
                                                 EncoderDecoderLM,
                                                 log_mel_spectrogram)

    if args.audio:
        audio, sr = read_wav(args.audio)
        print(f"loaded {len(audio) / sr:.2f}s of audio at {sr} Hz")
    else:
        sr = 16000
        t = np.arange(sr) / sr
        audio = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        print("no audio given; using a synthetic 440 Hz tone")

    cfg = EncoderDecoderConfig(
        vocab_size=256, n_enc_layers=4, n_dec_layers=4, n_heads=8,
        d_model=256, d_ff=1024, n_mels=80, max_source_len=512,
        max_target_len=128)
    model = EncoderDecoderLM(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    print("random weights (architecture/pipeline demo)")

    mel = log_mel_spectrogram(audio, sample_rate=sr, n_mels=cfg.n_mels)
    mel = mel[:cfg.max_source_len]
    print(f"log-mel features: {mel.shape}")

    tokens = model.generate(params, mel[None], start_token=1,
                            max_tokens=args.max_tokens, eos_token=2)
    print("decoded token ids:", tokens[0].tolist())


if __name__ == "__main__":
    main()
