from blah2_tpu.data.ddmap import DelayDopplerMap  # noqa: F401
from blah2_tpu.data.detection import Detection  # noqa: F401
from blah2_tpu.data.track import TrackStore, TrackState  # noqa: F401
from blah2_tpu.data.timing import Timing  # noqa: F401
from blah2_tpu.data.iq import IqRingBuffer  # noqa: F401
