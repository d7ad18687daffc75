from asr_decoder_tpu.fst.fst import StdFst, EPSILON, NO_STATE
from asr_decoder_tpu.fst.symbol import SymbolTable
from asr_decoder_tpu.fst.lattice import Lattice, LatticeArc
