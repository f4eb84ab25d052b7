"""Micro-batch crawl rounds with checkpoint/resume (the reference's
Kafka consume->process->store_offsets loop re-expressed as snapshot-
committed batch rounds)."""
