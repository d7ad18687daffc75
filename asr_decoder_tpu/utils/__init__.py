from asr_decoder_tpu.utils.config import ConfigOptions
from asr_decoder_tpu.utils.logging import get_logger, set_verbose_level, vlog
from asr_decoder_tpu.utils.timer import Timer
