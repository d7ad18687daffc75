"""CLI surface tests: every tool runs from files like the reference bins
(SURVEY §2.9) — offline decode with RTF/WER report, graph/LM converters,
LM scoring/rescale, lattice rescoring, WAV ingress."""

import io
import struct
import wave as wavelib

import numpy as np
import pytest

from asr_decoder_tpu.cli import (arpa2fsa, convert_graph, decode,
                                 lat_compose, lmrescale, lmscore)
from asr_decoder_tpu.frontend.audio import (AudioDecodeError, decode_audio,
                                            parse_wav, resample_linear)
from asr_decoder_tpu.lm.arpa import Fsa, parse_arpa

from test_lm import ARPA
from test_post_service import make_word_lattice
from test_session import make_info, make_wave


def write_wav(path, samples, rate=16000):
    with wavelib.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, np.int16).tobytes())


def test_wav_parse_and_resample(tmp_path):
    x = (np.sin(np.arange(8000) * 0.05) * 9000).astype(np.int16)
    p = tmp_path / "a.wav"
    write_wav(p, x)
    got, rate = parse_wav(p.read_bytes())
    assert rate == 16000
    np.testing.assert_array_equal(got, x.astype(np.float32))
    # sniffing dispatch
    np.testing.assert_array_equal(decode_audio(p.read_bytes()), got)
    # stereo averaging
    st = np.stack([x, x], axis=1).ravel()
    buf = io.BytesIO()
    with wavelib.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(st.astype(np.int16).tobytes())
    got2, rate2 = parse_wav(buf.getvalue())
    assert rate2 == 8000
    np.testing.assert_allclose(got2, x.astype(np.float32), atol=0.51)
    # resample halves/doubles length
    assert len(resample_linear(got2, 8000, 16000)) == 2 * len(got2)
    with pytest.raises(AudioDecodeError):
        parse_wav(b"nonsense" * 10)


def test_opus_ffmpeg_path(tmp_path):
    """Opus ingress mirrors the reference's optional-FFmpeg transcode
    (ref: src/audio-convert/stream2pcm.h:46-118): round-trips when ffmpeg
    is on PATH, raises a clean gated error otherwise."""
    from asr_decoder_tpu.frontend.audio import decode_opus, ffmpeg_available
    if not ffmpeg_available():
        with pytest.raises(AudioDecodeError, match="ffmpeg"):
            decode_opus(b"OggS-fake-opus-payload")
        return
    import subprocess
    x = (np.sin(np.arange(16000) * 0.05) * 9000).astype(np.int16)
    wav = tmp_path / "a.wav"
    write_wav(wav, x)
    ogg = tmp_path / "a.ogg"
    subprocess.run(["ffmpeg", "-v", "error", "-i", str(wav),
                    "-c:a", "libopus", str(ogg)], check=True)
    got, rate = decode_opus(ogg.read_bytes())
    assert rate == 16000
    assert len(got) > 12000          # ~1 s of audio survived the codec
    # the decoded waveform correlates strongly with the original tone
    n = min(len(got), len(x))
    c = np.corrcoef(got[:n], x[:n].astype(np.float32))[0, 1]
    assert abs(c) > 0.5


def test_decode_cli_end_to_end(tmp_path, capsys):
    """decode main ≡ kaldi-my-decoder: model+graph+words+wavlist from
    files → per-utt text + RTF + WER report."""
    info = make_info()
    am = tmp_path / "final.nnet"
    info.nnet.write_binary(str(am))
    graph = tmp_path / "graph.fst"
    info.fst.write_binary(str(graph))
    words = tmp_path / "words.txt"
    info.words.write_text(str(words))
    wavs = []
    for i in range(2):
        p = tmp_path / f"u{i}.wav"
        write_wav(p, make_wave(i, n=8000))
        wavs.append(p)
    lst = tmp_path / "wav.list"
    lst.write_text("".join(f"u{i} {p}\n" for i, p in enumerate(wavs)))

    # expectation via the library session on the same files
    from asr_decoder_tpu.serving.session import OnlineDecoderSession
    want = []
    for i in range(2):
        s = OnlineDecoderSession(info)
        s.process_data(make_wave(i, n=8000), eos=True)
        want.append(s.get_best_path_txt())

    ref = tmp_path / "ref.txt"
    ref.write_text(f"u0 {want[0]}\nu1 x y z\n")
    rc = decode.main([
        "--beam=1e9", "--beam-width=64", "--arc-lanes=8", "--min-active=0",
        "--chunk-frames=16", "--fbank.num-bins=16", "--ali=true",
        f"--ref-text={ref}", str(am), str(graph), str(words), str(lst)])
    assert rc == 0
    out = capsys.readouterr()
    lines = [ln for ln in out.out.splitlines() if ln.strip()]
    assert lines[0] == f"u0 {want[0]}".rstrip()
    ali_lines = [ln for ln in lines if " ali " in ln]
    assert len(ali_lines) == sum(len(w.split()) for w in want)
    text_lines = [ln for ln in lines if " ali " not in ln]
    assert text_lines[1] == f"u1 {want[1]}".rstrip()
    assert "real-time factor" in out.err
    assert "%WER" in out.err


def test_lm_tools_roundtrip(tmp_path, capsys):
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    fsa_path = tmp_path / "lm.fsa"
    assert arpa2fsa.main([str(arpa), str(fsa_path)]) == 0
    fsa = Fsa.read_binary(str(fsa_path))
    want = parse_arpa(ARPA)
    assert fsa.num_states == want.num_states
    assert fsa.num_arcs == want.num_arcs

    # lmscore on text == library scoring
    txt = tmp_path / "in.txt"
    vocab_words = [w for w in want.vocab
                   if w not in ("<s>", "</s>", "<unk>")][:2]
    txt.write_text(" ".join(vocab_words) + "\n")
    assert lmscore.main([str(fsa_path), str(txt)]) == 0
    out = capsys.readouterr().out.strip().split("\t")
    from asr_decoder_tpu.lm.compose import ArpaLmScore
    assert float(out[0]) == pytest.approx(
        ArpaLmScore(want).score_text(vocab_words), abs=1e-4)

    # lmrescale: weights scale
    scaled = tmp_path / "lm2.fsa"
    assert lmrescale.main(["--scale=-1.0", str(fsa_path), str(scaled)]) == 0
    got = Fsa.read_binary(str(scaled))
    np.testing.assert_allclose(got.arc_weight, -want.arc_weight, atol=1e-6)

    # lat-compose add mode == compose_lattice
    lat = make_word_lattice(3)
    lat_path = tmp_path / "l.lat"
    lat.write_binary(str(lat_path))
    assert lat_compose.main(["--nbest=2", str(lat_path),
                             str(fsa_path)]) == 0
    out_lines = capsys.readouterr().out.strip().splitlines()
    from asr_decoder_tpu.fst.lattice import Lattice
    from asr_decoder_tpu.fst.nbest import nshortest
    from asr_decoder_tpu.lm.compose import ComposeArpaLm, compose_lattice
    want_lat = compose_lattice(Lattice.read_binary(str(lat_path)),
                               ComposeArpaLm(want, 1.0))
    want_best = nshortest(want_lat, 2)
    assert len(out_lines) == len(want_best)
    for ln, p in zip(out_lines, want_best):
        cost, ws = ln.split("\t")
        assert float(cost) == pytest.approx(p.graph_cost + p.am_cost,
                                            abs=1e-3)
        assert ws.split() == [str(a.olabel) for a in p.arcs
                              if a.olabel != 0]


def test_convert_graph_roundtrip(tmp_path, capsys):
    info = make_info()
    src = tmp_path / "in.fst"
    info.fst.write_binary(str(src))
    dst = tmp_path / "out.fst"
    assert convert_graph.main([str(src), str(dst)]) == 0
    from asr_decoder_tpu.fst.fst import StdFst
    got = StdFst.read_binary(str(dst))
    assert got.num_states == info.fst.num_states
    assert got.num_arcs == info.fst.num_arcs


def test_dispatcher_help(capsys):
    import asr_decoder_tpu.__main__ as m
    import sys
    old = sys.argv
    sys.argv = ["asr_decoder_tpu", "--help"]
    try:
        assert m.main() == 0
    finally:
        sys.argv = old
    assert "serve" in capsys.readouterr().out
