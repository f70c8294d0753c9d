"""Structured Streaming surface (SURVEY.md §2.11 X1 — a capability the
reference lacks entirely). Batch-equivalent window expressions live in
plans/events_stream.py; this package wires the same expressions into
readStream/writeStream with watermarks."""
