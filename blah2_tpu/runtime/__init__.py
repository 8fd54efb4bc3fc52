from blah2_tpu.runtime.radar import RadarRuntime  # noqa: F401
