from blah2_tpu.capture.source import Source  # noqa: F401
from blah2_tpu.capture.replay import FileReplaySource  # noqa: F401
from blah2_tpu.capture.synthetic import SyntheticSource, synthetic_cpi  # noqa: F401
from blah2_tpu.capture.capture import Capture, factory_source  # noqa: F401
