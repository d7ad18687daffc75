"""Command-line executables (the reference's L8 bin surface, SURVEY §2.9).

Every tool is a thin main over library functions, driven by the
``ConfigOptions`` flag system (``--key=value``, ``--config=FILE``), like the
reference's bins are thin mains over ParseOptions-registered classes.

  python -m asr_decoder_tpu.cli.serve          ref: v2-asrbin/v2-asr-service.cc
  python -m asr_decoder_tpu.cli.post_serve     ref: post-processing-service/asr-post-process-service.cc
  python -m asr_decoder_tpu.cli.decode         ref: kaldi-nnet3bin/kaldi-my-decoder.cc
  python -m asr_decoder_tpu.cli.arpa2fsa       ref: newlm/arpa2fsa-bin.cc
  python -m asr_decoder_tpu.cli.convert_graph  ref: fst_format_convert_tool/convert_fst.c
  python -m asr_decoder_tpu.cli.lmscore        ref: newlm/lmscore.cc
  python -m asr_decoder_tpu.cli.lmrescale      ref: newlm/lmrescale.cc
  python -m asr_decoder_tpu.cli.lat_compose    ref: newlm/lat-compose.cc

or via the dispatcher: ``python -m asr_decoder_tpu <tool> [args]``.
"""
