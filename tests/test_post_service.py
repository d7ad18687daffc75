"""Post-processing (second-pass rescore) service tests: protocol round
trip, add/replace scale modes vs in-process composition, and the full
pipeline ASR server → client → post server (ref:
src/post-processing-service/asr-post-process-service.cc,
const-lm-rescore.h:66-205)."""

import asyncio

import numpy as np
import pytest

from asr_decoder_tpu.fst.lattice import Lattice
from asr_decoder_tpu.fst.nbest import nshortest
from asr_decoder_tpu.lm.arpa import parse_arpa
from asr_decoder_tpu.lm.compose import ComposeArpaLm, compose_lattice
from asr_decoder_tpu.serving.client import AsyncAsrClient
from asr_decoder_tpu.serving.post_service import (MODE_ADD, MODE_REPLACE,
                                                  ConstLmRescorer,
                                                  PostConfig, PostServer,
                                                  rescore_via_service)
from asr_decoder_tpu.serving.server import AsrServer, SocketConfig

from test_lm import ARPA, ARPA2
from test_session import make_info, make_wave


@pytest.fixture(scope="module")
def lms():
    lm1 = parse_arpa(ARPA)
    lm2 = parse_arpa(ARPA2, word2id=lm1.vocab)
    return lm1, lm2


def make_word_lattice(seed=0):
    """Small random acyclic word lattice (olabels 1..4)."""
    rng = np.random.default_rng(seed)
    from asr_decoder_tpu.fst.lattice import LatticeArc
    from asr_decoder_tpu.fst.semiring import LatticeWeight
    lat = Lattice()
    n = 6
    for _ in range(n):
        lat.add_state()
    lat.set_start(0)
    for s in range(n - 1):
        for d in range(s + 1, min(s + 3, n)):
            lat.add_arc(s, LatticeArc(
                s + 1, int(rng.integers(1, 5)),
                LatticeWeight(float(rng.random()), float(rng.random())),
                d))
    lat.set_final(n - 1)
    return lat


def test_lattice_bytes_roundtrip():
    lat = make_word_lattice(1)
    got = Lattice.from_bytes(lat.to_bytes())
    assert got.to_text() == lat.to_text()


@pytest.mark.parametrize("mode", [MODE_ADD, MODE_REPLACE])
def test_post_server_matches_inprocess(lms, mode):
    lm1, lm2 = lms
    lat = make_word_lattice(2)
    rescorer = ConstLmRescorer(lm2, lm1)
    # expectation composes the f32 wire round-trip of the input, exactly
    # like the server side sees it
    want = rescorer.rescore(Lattice.from_bytes(lat.to_bytes()), mode, 0.8)
    want_paths = nshortest(want, 3)

    async def run():
        server = PostServer(rescorer, PostConfig(port=0))
        host, port = await server.start()
        try:
            return await rescore_via_service(
                lat, host, port, mode=mode, lm_scale=0.8, nbest=3)
        finally:
            await server.stop()

    resp = asyncio.run(run())
    assert resp.ok
    got_lat = Lattice.from_bytes(resp.lattice)
    # normalize the in-process expectation through the f32 wire format
    want_rt = Lattice.from_bytes(want.to_bytes())
    assert sorted(got_lat.to_text().splitlines()) == \
        sorted(want_rt.to_text().splitlines())
    assert len(resp.results) == len(want_paths)
    for r, p in zip(resp.results, want_paths):
        assert r.words == [a.olabel for a in p.arcs if a.olabel != 0]
        assert r.graph_cost == pytest.approx(p.graph_cost, abs=1e-4)


def test_post_server_rejects_garbage(lms):
    lm1, lm2 = lms

    async def run():
        server = PostServer(ConstLmRescorer(lm2, lm1), PostConfig(port=0))
        host, port = await server.start()
        try:
            from asr_decoder_tpu.serving.post_service import (PostRequest,
                                                              PostResponse)
            reader, writer = await asyncio.open_connection(host, port)
            writer.write(PostRequest(lattice=b"\x01bad").pack())
            await writer.drain()
            resp = await PostResponse.read(reader)
            writer.close()
            return resp
        finally:
            await server.stop()

    resp = asyncio.run(run())
    assert not resp.ok and not resp.results


def test_asr_to_post_pipeline(lms):
    """Full two-service pipeline: decode over TCP, forward the returned
    lattice to the post service, get rescored n-best back (the v2 service
    do_rescore flow)."""
    lm1, lm2 = lms
    info = make_info()
    wave = make_wave(9)

    async def run():
        asr = AsrServer(info, SocketConfig(port=0, num_channels=2,
                                           advertise_rescore=True))
        post = PostServer(ConstLmRescorer(lm2), PostConfig(port=0))
        (ah, ap) = await asr.start()
        (ph, pp) = await post.start()
        try:
            client = AsyncAsrClient(ah, ap)
            await client.connect()
            reply = await client.decode_utterance(
                wave.astype(np.int16), lattice=True)
            await client.close()
            assert reply.lattice and reply.do_rescore
            lat = Lattice.from_bytes(reply.lattice)
            resp = await rescore_via_service(lat, ph, pp, mode=MODE_ADD,
                                             lm_scale=0.5, nbest=2)
            return lat, resp
        finally:
            await asr.stop()
            await post.stop()

    lat, resp = asyncio.run(run())
    assert resp.ok and resp.results
    want = compose_lattice(lat, ComposeArpaLm(lm2, 0.5))
    want_best = nshortest(want, 1)[0]
    assert resp.results[0].words == \
        [a.olabel for a in want_best.arcs if a.olabel != 0]


def test_native_nbest_matches_python():
    """The native C++ n-shortest (native/lattice_ops.cc) must reproduce
    fst/nbest.py::nshortest exactly — words, ilabels, pop order, dedup —
    on random word lattices and on decode-shaped lattices."""
    from asr_decoder_tpu.fst import native_nbest
    from asr_decoder_tpu.fst.nbest import nshortest
    if not native_nbest.available():
        pytest.skip("no g++ toolchain")
    for seed in range(6):
        lat = make_word_lattice(seed)
        data = lat.to_bytes()
        for n in (1, 3, 8):
            got = native_nbest.nshortest_bytes(data, n)
            want = nshortest(lat, n)
            assert len(got) == len(want), (seed, n)
            for g, w in zip(got, want):
                assert g["words"] == [a.olabel for a in w.arcs
                                      if a.olabel != 0]
                assert g["ilabels"] == w.ilabels
                assert g["graph_cost"] == pytest.approx(w.graph_cost,
                                                        abs=1e-4)
                assert g["am_cost"] == pytest.approx(w.am_cost, abs=1e-4)


def test_native_nbest_rejects_malformed():
    from asr_decoder_tpu.fst import native_nbest
    if not native_nbest.available():
        pytest.skip("no g++ toolchain")
    with pytest.raises(ValueError):
        native_nbest.nshortest_bytes(b"\x01\x00\x00\x00" * 10, 3)
    with pytest.raises(ValueError):   # truncated header
        native_nbest.nshortest_bytes(b"", 3)
