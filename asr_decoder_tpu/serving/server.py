"""Streaming ASR TCP service.

Capability parity with the reference v2 service stack — socket setup
(ref: src/service2/socket-class.h:19-70), the worker pool
(ref: src/service2/thread-pool.h:16-66), the per-connection task loop
(ref: src/v2-asr/v2-asr-task.h:57-327), and per-utterance RTF accounting
(ref: src/service2/thread-info.h:10-23, v1-asr/v1-asr-task.h:238-251).

Host-runtime design for TPU serving: connections are asyncio coroutines (the
reference's 1-thread-per-connection becomes 1-coroutine-per-connection);
device work is serialized through a bounded thread-pool executor so many
streams share the single jitted decode program — sessions of one
``OnlineDecoderInfo`` share all compilations.  A ``workers`` semaphore plays
the reference's ``--nthread`` role as the admission limit.
"""

from __future__ import annotations

import asyncio
import pickle
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from asr_decoder_tpu.serving.protocol import (C2SPackage, EndFlag,
                                              NbestResult, S2CPackage,
                                              frame_s2c, read_c2s)
from asr_decoder_tpu.serving.session import (OnlineDecoderInfo,
                                             OnlineDecoderSession)
from asr_decoder_tpu.utils.config import ConfigOptions, flag
from asr_decoder_tpu.utils.logging import get_logger

LOG = get_logger("serving")


@dataclass
class SocketConfig:
    """ref: SocketConf (service2/socket-class.h:19-67)."""
    ip: str = flag("127.0.0.1", "Listen address")
    port: int = flag(8100, "Listen port")
    nthread: int = flag(8, "Concurrent decode admission limit")
    rec_timeout: int = flag(30, "Per-package receive timeout (s)")

    def register(self, opts: ConfigOptions, prefix: str = "") -> None:
        opts.register_dataclass(self, prefix)


@dataclass
class UttStats:
    """Per-utterance timing (ref: ThreadTimeInfo semantics)."""
    wav_seconds: float = 0.0
    work_seconds: float = 0.0

    @property
    def rtf(self) -> float:
        return self.work_seconds / self.wav_seconds if self.wav_seconds else 0.0


class AsrServer:
    def __init__(self, info: OnlineDecoderInfo,
                 socket_config: SocketConfig | None = None):
        self.info = info
        self.config = socket_config or SocketConfig()
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="device")
        self._sem = asyncio.Semaphore(self.config.nthread)
        self._server: asyncio.AbstractServer | None = None
        self.total = UttStats()

    # -- lifecycle ---------------------------------------------------------
    async def start(self) -> tuple[str, int]:
        self._server = await asyncio.start_server(
            self._handle, self.config.ip, self.config.port)
        addr = self._server.sockets[0].getsockname()[:2]
        LOG.info("listening on %s:%d", *addr)
        return addr

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
        self._pool.shutdown(wait=True)

    async def serve_forever(self) -> None:
        await self.start()
        assert self._server is not None
        async with self._server:
            await self._server.serve_forever()

    # -- per-connection task loop (ref: v2-asr-task.h:57-327) --------------
    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter) -> None:
        loop = asyncio.get_running_loop()
        session: OnlineDecoderSession | None = None
        stats = UttStats()
        sr = 16000
        try:
            async with self._sem:
                while True:
                    try:
                        pkg = await asyncio.wait_for(
                            read_c2s(reader), self.config.rec_timeout)
                    except (asyncio.IncompleteReadError, ConnectionError):
                        break
                    if session is None or pkg.audio_head:
                        session = await loop.run_in_executor(
                            self._pool, self._new_session)
                        stats = UttStats()
                        sr = pkg.sample_rate.hz
                    samples = pkg.samples()
                    stats.wav_seconds += len(samples) / sr
                    t0 = time.monotonic()
                    await loop.run_in_executor(
                        self._pool, session.process_data, samples,
                        bool(pkg.end_flag))
                    endpoint = session.endpoint_detected()
                    reply = await loop.run_in_executor(
                        self._pool, self._results, session, pkg,
                        bool(pkg.end_flag) or endpoint)
                    stats.work_seconds += time.monotonic() - t0
                    writer.write(frame_s2c(reply))
                    await writer.drain()
                    if pkg.end_flag:
                        LOG.info("utt done: wav=%.2fs work=%.2fs rtf=%.4f",
                                 stats.wav_seconds, stats.work_seconds,
                                 stats.rtf)
                        self.total.wav_seconds += stats.wav_seconds
                        self.total.work_seconds += stats.work_seconds
                        session = None
                    elif endpoint:
                        # mid-stream endpoint: restart search, keep stream
                        # (ref: MIDDLEEND + InitDecoding(frame_offset))
                        await loop.run_in_executor(
                            self._pool, session.init_decoding)
        finally:
            writer.close()
            try:
                await writer.wait_closed()
            except ConnectionError:
                pass

    def _new_session(self) -> OnlineDecoderSession:
        return OnlineDecoderSession(self.info)

    def _results(self, session: OnlineDecoderSession, pkg: C2SPackage,
                 final: bool) -> S2CPackage:
        """Build the S2C reply (ref: v2-asr-task.h SendDataAndGetResult)."""
        end = (EndFlag.END if pkg.end_flag
               else EndFlag.MIDDLEEND if final else EndFlag.NOEND)
        reply = S2CPackage(end_flag=end)
        n = max(1, pkg.nbest) if final else 1
        if final and pkg.nbest > 1:
            for r in session.get_nbest(n):
                reply.results.append(NbestResult(
                    r["text"], r["graph_cost"], r["am_cost"], r["words"]))
        if not reply.results:
            best = session.get_best_path()
            reply.results.append(NbestResult(
                " ".join(self.info.words.words(best.get("words", []))),
                best.get("cost", 0.0), 0.0, best.get("words", [])))
        if final and pkg.lattice:
            lat = session.get_lattice(determinize=True)
            if lat is not None:
                reply.lattice = pickle.dumps(lat.to_text())
        return reply


def run_server(info: OnlineDecoderInfo,
               socket_config: SocketConfig | None = None) -> None:
    asyncio.run(AsrServer(info, socket_config).serve_forever())
