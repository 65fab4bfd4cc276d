"""Beam-search parity against an independent torch port of openai-whisper's
BeamSearchDecoder.

The reference runs beam search through whisper's DecodingTask
(app/services/audio_processor.py:1076 — beam_size is an accepted option of
whisper_model.transcribe).  Greedy decode already has a token-exact torch
oracle (test_parity_generate.py); this gives beam the same treatment: the
oracle re-implements whisper's published algorithm — per-beam top-(K+1)
candidate merge, dict-based dedup, finished_sequences with first-come
capacity K (patience=1), finalize top-up from unfinished beams, and the
MaximumLikelihoodRanker(None) average-logprob ranking — over the SAME
random-init HF model our params are converted from, and the device
beam_decode must match token-for-token.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from audio_processor_tpu.models.whisper import convert, decode, model
from audio_processor_tpu.models.whisper.config import WhisperConfig

CFG = WhisperConfig(
    name="beamparity",
    n_mels=80,
    n_audio_ctx=96,
    n_audio_state=64,
    n_audio_head=2,
    n_audio_layer=2,
    n_vocab=1024,
    n_text_ctx=64,
    n_text_state=64,
    n_text_head=2,
    n_text_layer=2,
)
ST = decode.SpecialTokens.for_config(CFG)


@pytest.fixture(scope="module")
def hf_pair():
    import torch
    from transformers import WhisperConfig as HFConfig, WhisperModel

    torch.manual_seed(11)
    hf_cfg = HFConfig(
        vocab_size=CFG.n_vocab,
        num_mel_bins=CFG.n_mels,
        encoder_layers=CFG.n_audio_layer,
        encoder_attention_heads=CFG.n_audio_head,
        decoder_layers=CFG.n_text_layer,
        decoder_attention_heads=CFG.n_text_head,
        d_model=CFG.n_audio_state,
        max_source_positions=CFG.n_audio_ctx,
        max_target_positions=CFG.n_text_ctx,
        encoder_ffn_dim=4 * CFG.n_audio_state,
        decoder_ffn_dim=4 * CFG.n_text_state,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=[],
        begin_suppress_tokens=[],
    )
    hf = WhisperModel(hf_cfg).eval()
    params = convert.from_hf_state_dict(hf.state_dict(), CFG)
    return hf, params


def _torch_beam_reference(hf, mel, sot_seq, eot, beam_size, max_new,
                          patience=1.0):
    """openai-whisper BeamSearchDecoder + finalize + ranker, re-implemented
    over torch logits (whisper/decoding.py semantics,
    length_penalty=None)."""
    import torch

    n_audio = mel.shape[0]
    k = beam_size
    max_candidates = max(1, round(k * patience))
    with torch.no_grad():
        enc = hf.encoder(torch.from_numpy(mel)).last_hidden_state
        enc_rep = enc.repeat_interleave(k, dim=0)
        emb_t = hf.decoder.embed_tokens.weight.T
        tokens = torch.tensor(
            [list(sot_seq)] * (n_audio * k), dtype=torch.long
        )
        sum_logprobs = torch.zeros(n_audio * k)
        finished_sequences = [dict() for _ in range(n_audio)]
        for _ in range(max_new):
            hs = hf.decoder(
                input_ids=tokens, encoder_hidden_states=enc_rep
            ).last_hidden_state
            logprobs = torch.log_softmax(
                (hs[:, -1] @ emb_t).float(), -1
            )
            next_rows, new_sums = [], []
            for i in range(n_audio):
                scores, sources, finished = {}, {}, {}
                for j in range(k):
                    idx = i * k + j
                    prefix = tokens[idx].tolist()
                    lp, tk = logprobs[idx].topk(k + 1)
                    for logprob, token in zip(lp, tk):
                        sequence = tuple(prefix + [int(token)])
                        scores[sequence] = float(sum_logprobs[idx] + logprob)
                        sources[sequence] = idx
                saved = 0
                for sequence in sorted(scores, key=scores.get, reverse=True):
                    if sequence[-1] == eot:
                        finished[sequence] = scores[sequence]
                    else:
                        next_rows.append(list(sequence))
                        new_sums.append(scores[sequence])
                        saved += 1
                        if saved == k:
                            break
                prev = finished_sequences[i]
                for seq in sorted(finished, key=finished.get, reverse=True):
                    if len(prev) >= max_candidates:
                        break
                    prev[seq] = finished[seq]
            tokens = torch.tensor(next_rows, dtype=torch.long)
            sum_logprobs = torch.tensor(new_sums)
            if all(len(fs) >= max_candidates for fs in finished_sequences):
                break
        # finalize: top up short elements from the live beams by raw score
        for i, seqs in enumerate(finished_sequences):
            if len(seqs) < k:
                order = np.argsort(
                    [-float(sum_logprobs[i * k + j]) for j in range(k)]
                )
                for j in order:
                    seq = tuple(tokens[i * k + j].tolist()) + (eot,)
                    seqs[seq] = float(sum_logprobs[i * k + j])
                    if len(seqs) >= k:
                        break
        # MaximumLikelihoodRanker(length_penalty=None): avg logprob over the
        # sampled tokens (after the sot prefix, excluding the EOT)
        best_rows = []
        for seqs in finished_sequences:
            def avg(item):
                seq, s = item
                length = len(seq) - len(sot_seq) - 1
                return s / max(length, 1)
            best_rows.append(max(seqs.items(), key=avg))
    return best_rows  # [(sequence incl sot prefix + eot, raw sum)]


@pytest.mark.parametrize("beam_size", [2, 3, 5])
def test_beam_decode_matches_whisper_algorithm(hf_pair, rng, beam_size):
    hf, params = hf_pair
    mel = rng.normal(0, 1, (3, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(
        np.float32
    )
    max_new = 16
    sot_seq = (ST.sot,)
    ref = _torch_beam_reference(hf, mel, sot_seq, ST.eot, beam_size, max_new)

    audio = model.encode(params, CFG, jnp.asarray(mel))
    res = decode.beam_decode(
        params, CFG, audio,
        sot_sequence=sot_seq,
        beam_size=beam_size,
        max_new_tokens=max_new,
        use_timestamps=False,  # raw algorithm — whisper rules gated elsewhere
        suppress_mask=None,
    )
    ours = np.asarray(res.tokens)
    ours_sum = np.asarray(res.sum_logprob)
    for i, (seq, ref_sum) in enumerate(ref):
        new = list(seq[len(sot_seq):])  # strip prefix; keep the EOT
        if new and new[-1] == ST.eot:
            new = new[:-1]
        got = [int(t) for t in ours[i] if int(t) != ST.eot]
        assert got == new, (
            f"beam_size={beam_size} row {i}: {got} != {new}"
        )
        np.testing.assert_allclose(ours_sum[i], ref_sum, atol=5e-3)


@pytest.mark.parametrize("patience", [0.5, 2.0])
def test_beam_patience_matches_whisper_algorithm(hf_pair, rng, patience):
    """patience scales the finished-set capacity (Kasai et al., whisper's
    --patience); the device loop must track the oracle at != 1.0 too."""
    hf, params = hf_pair
    mel = rng.normal(0, 1, (2, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(
        np.float32
    )
    max_new, k = 16, 3
    sot_seq = (ST.sot,)
    ref = _torch_beam_reference(
        hf, mel, sot_seq, ST.eot, k, max_new, patience=patience
    )
    audio = model.encode(params, CFG, jnp.asarray(mel))
    res = decode.beam_decode(
        params, CFG, audio,
        sot_sequence=sot_seq, beam_size=k, patience=patience,
        max_new_tokens=max_new, use_timestamps=False, suppress_mask=None,
    )
    ours = np.asarray(res.tokens)
    for i, (seq, ref_sum) in enumerate(ref):
        new = list(seq[len(sot_seq):])
        if new and new[-1] == ST.eot:
            new = new[:-1]
        got = [int(t) for t in ours[i] if int(t) != ST.eot]
        assert got == new, f"patience={patience} row {i}: {got} != {new}"
        np.testing.assert_allclose(
            np.asarray(res.sum_logprob)[i], ref_sum, atol=5e-3
        )


def test_beam_matches_greedy_when_k1(hf_pair, rng):
    """beam_size=1 must reduce exactly to greedy (same candidate set)."""
    _, params = hf_pair
    mel = rng.normal(0, 1, (2, CFG.n_mels, 2 * CFG.n_audio_ctx)).astype(
        np.float32
    )
    audio = model.encode(params, CFG, jnp.asarray(mel))
    kw = dict(
        sot_sequence=(ST.sot,), max_new_tokens=12,
        use_timestamps=False, suppress_mask=None,
    )
    g = decode.greedy_decode(params, CFG, audio, **kw)
    b = decode.beam_decode(params, CFG, audio, beam_size=1, **kw)
    gt = np.asarray(g.tokens)
    bt = np.asarray(b.tokens)
    for i in range(2):
        n = int((gt[i] != ST.eot).sum())
        np.testing.assert_array_equal(bt[i][:n], gt[i][:n])
