"""V1 VAD-orchestrated session tests: silence skips device work, segment
results equal speech-only decoding, realtime == end-compressed on clean
cuts (ref: src/v1-asr/kaldi-v1-asr-online.h:303-657)."""

import numpy as np
import pytest

from asr_decoder_tpu.serving.session import OnlineDecoderSession
from asr_decoder_tpu.serving.v1_session import V1AsrConfig, V1AsrSession
from asr_decoder_tpu.vad.energy import EnergyVadStream, vad_segments
from asr_decoder_tpu.vad.model_vad import merge_same_audio

from test_session import make_info, make_wave


@pytest.fixture(scope="module")
def info():
    return make_info(seed=31)


def make_sil_speech_wave(seed, speech_s=0.7, sil_s=1.2, amp=6000.0):
    """speech ++ long-silence ++ speech, with exact-zero silence so the
    energy VAD segmentation is unambiguous."""
    sr = 16000
    rng = np.random.default_rng(seed)
    sp1 = (rng.standard_normal(int(sr * speech_s)) * amp).astype(np.float32)
    sp2 = (rng.standard_normal(int(sr * speech_s)) * amp).astype(np.float32)
    sil = np.zeros(int(sr * sil_s), np.float32)
    return np.concatenate([sp1, sil, sp2]), (sp1, sil, sp2)


def _expected_segments(info, cfg, wave):
    """Offline VAD → merged AUDIO frame runs (the orchestrator's own
    segmentation rule, derived independently)."""
    vad = EnergyVadStream(info.vad_config)
    dec = np.asarray(vad.accept(wave[None], end=True))[0]
    segs = vad_segments(dec.astype(np.int64))
    segs = merge_same_audio(segs, cfg.sil_frames_cut)
    return [(b, e) for f, b, e in segs if f == 1]


def test_silence_skips_device_work_and_results_match(info):
    wave, _ = make_sil_speech_wave(0)
    cfg = V1AsrConfig(sil_frames_cut=40)
    s = V1AsrSession(info, cfg)
    # stream in uneven chunks
    for lo in range(0, len(wave), 7000):
        s.process_data(wave[lo:lo + 7000])
    s.process_data(np.zeros(0, np.float32), eos=True)

    assert len(s.results) == 2, [r["frame_span"] for r in s.results]
    total_frames = s.tot_sil_frames + s.tot_nosil_frames
    assert s.tot_sil_frames > 80           # the 1.2 s gap registered
    assert s.frames_decoded() < total_frames * 0.75  # sil skipped the AM

    # per-segment results == decoding exactly the fed speech PCM alone
    segs = _expected_segments(info, cfg, wave)
    assert [r["frame_span"][0] for r in s.results] == [b for b, _ in segs]
    shift, length = (info.vad_config.frame_shift_samp,
                     info.vad_config.frame_length_samp)
    for res, (b, e) in zip(s.results, segs):
        pcm = wave[b * shift:e * shift + (length - shift)]
        ref = OnlineDecoderSession(info)
        ref.process_data(pcm, eos=True)
        want = ref.get_best_path()
        assert res["words"] == want["words"]
        assert res["cost"] == pytest.approx(want["cost"], abs=1e-3)


def test_realtime_matches_end_compressed(info):
    wave, _ = make_sil_speech_wave(1)
    rt = V1AsrSession(info, V1AsrConfig(sil_frames_cut=40,
                                        min_sil_frames_interval=40))
    rt.process_data(wave, eos=True)
    ec = V1AsrSession(info, V1AsrConfig(use_realtime_vad=False,
                                        sil_frames_cut=40,
                                        min_sil_frames_interval=40))
    ec.process_data(wave, eos=True)
    assert rt.result_text() == ec.result_text()
    assert [r["words"] for r in rt.results] == \
        [r["words"] for r in ec.results]


def test_short_gap_is_merged(info):
    """A pause shorter than sil_frames_cut must NOT split the utterance."""
    sr = 16000
    rng = np.random.default_rng(5)
    sp1 = (rng.standard_normal(sr // 2) * 6000).astype(np.float32)
    gap = np.zeros(int(0.15 * sr), np.float32)      # 15 frames < 40
    sp2 = (rng.standard_normal(sr // 2) * 6000).astype(np.float32)
    wave = np.concatenate([sp1, gap, sp2])
    s = V1AsrSession(info, V1AsrConfig(sil_frames_cut=40))
    s.process_data(wave, eos=True)
    assert len(s.results) == 1


def test_max_nosil_splits_long_speech(info):
    wave = make_wave(6, n=32000, amp=6000.0)        # 2 s continuous speech
    s = V1AsrSession(info, V1AsrConfig(sil_frames_cut=40,
                                       max_nosil_frames=60))
    s.process_data(wave, eos=True)
    assert len(s.results) >= 3
    for r in s.results:
        b, e = r["frame_span"]
        assert e - b <= 60


def test_v1_segments_carry_word_alignment(info):
    """Every finalized segment carries per-word (begin_s, end_s) spans
    matching its own word sequence (the AlignTime result attached at
    segment finalization, ref net-data-package.h:210)."""
    wave = make_wave(8, n=24000, amp=6000.0)
    s = V1AsrSession(info, V1AsrConfig(sil_frames_cut=40))
    s.process_data(wave, eos=True)
    assert s.results
    for r in s.results:
        assert "align" in r
        assert [w for w, _, _ in r["align"]] == \
            info.words.words(r["words"])
        last = 0.0
        for _, b, e in r["align"]:
            assert b >= last - 1e-6 and e >= b
            last = e
