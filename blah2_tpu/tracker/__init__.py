from blah2_tpu.tracker.tracker import Tracker  # noqa: F401
