from argus_spark.chain.synth import (  # noqa: F401
    CHAIN_SQL_CTES,
    synth_blocks,
    synth_chain_events,
    synth_inputs,
    synth_outputs,
    synth_watched,
)
