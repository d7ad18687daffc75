"""Shared model/graph loading for the CLI mains (the OnlineDecoderInfo
construction the reference does in OnlineDecoderConf + OnlineDecoderInfo,
ref: src/kaldi-nnet3/kaldi-online-nnet3-my-decoder.h:22-231)."""

from __future__ import annotations

import numpy as np

from asr_decoder_tpu.decoder.config import DecoderConfig
from asr_decoder_tpu.frontend.fbank import FbankConfig
from asr_decoder_tpu.fst.fst import StdFst
from asr_decoder_tpu.fst.symbol import SymbolTable
from asr_decoder_tpu.models.nnet import AmConfig, Nnet
from asr_decoder_tpu.serving.session import (OnlineDecoderConfig,
                                             OnlineDecoderInfo)
from asr_decoder_tpu.utils.config import ConfigOptions


def register_info_flags(opts: ConfigOptions):
    """Register the full session flag surface; returns the config objects."""
    dec = DecoderConfig()
    online = OnlineDecoderConfig()
    fbank = FbankConfig()
    am = AmConfig()
    dec.register(opts)
    online.register(opts)
    fbank.register(opts, "fbank")
    am.register(opts, "am")
    extra = {"trans-model": "", "hmmfst-file": ""}
    opts.register("trans-model",
                  lambda: extra["trans-model"],
                  lambda v: extra.__setitem__("trans-model", v),
                  "Kaldi transition model (ilabel→pdf map); empty = "
                  "identity/CTC mapping", str)
    opts.register("hmmfst-file",
                  lambda: extra["hmmfst-file"],
                  lambda v: extra.__setitem__("hmmfst-file", v),
                  "HMM bundle for graph-type=clg (ref --hmmfst-file)", str)
    return dec, online, fbank, am, extra


def load_graph(path: str) -> StdFst:
    """Custom binary or OpenFST ConstFst/VectorFst, sniffed by magic."""
    import struct
    with open(path, "rb") as f:
        head = f.read(4)
    if len(head) == 4 and struct.unpack("<i", head)[0] == 2125659606:
        return StdFst.read_openfst_const(path)
    return StdFst.read_binary(path)


def build_info(am_path: str, graph_path: str, words_path: str,
               dec, online, fbank, am, extra) -> OnlineDecoderInfo:
    nnet = Nnet.read_binary(am_path)
    words = SymbolTable.read_text(words_path)
    kw = {}
    if online.graph_type == "clg":
        from asr_decoder_tpu.fst.clg import ClgFst
        assert extra["hmmfst-file"], "--hmmfst-file required for clg"
        kw["clg_graph"] = ClgFst.load(graph_path, extra["hmmfst-file"])
        fst = None
    else:
        fst = load_graph(graph_path)
    if extra["trans-model"]:
        from asr_decoder_tpu.models.transition import TransitionModel
        tm = TransitionModel.read(extra["trans-model"])
        i2p = tm.ilabel_map(ctc_blank_shift=online.ctc_blank_shift)
    else:
        # identity / CTC ilabel-1 mapping (ref nnet-nnet.h:212-233)
        n = nnet.output_dim
        if online.ctc_blank_shift:
            i2p = np.concatenate([[0], np.arange(n, dtype=np.int64)])
        else:
            i2p = np.arange(n + 1, dtype=np.int64)
    return OnlineDecoderInfo(nnet, fst, words, i2p, decoder_config=dec,
                             online_config=online, fbank_config=fbank,
                             am_config=am, **kw)
