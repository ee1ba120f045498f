"""``python -m gsrs_tpu`` → the graph-training CLI (see also
``python -m gsrs_tpu.seq_cli`` for the sequential family)."""

from gsrs_tpu.cli import main

main()
