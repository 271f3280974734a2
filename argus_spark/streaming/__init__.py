"""Structured Streaming mode (SURVEY §7 Phase 4): the lifecycle engine
behind ``readStream`` → ``foreachBatch`` → atomic store commits."""
