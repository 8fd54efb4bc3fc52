from blah2_tpu.dsp.hamming import next_hamming  # noqa: F401
from blah2_tpu.dsp.ambiguity import AmbiguityProcessor  # noqa: F401
from blah2_tpu.dsp.clutter import WienerHopfFilter  # noqa: F401
from blah2_tpu.dsp.spectrum import SpectrumAnalyser  # noqa: F401
from blah2_tpu.dsp.cfar import CfarDetector  # noqa: F401
from blah2_tpu.dsp.centroid import CentroidFilter  # noqa: F401
from blah2_tpu.dsp.interpolate import PeakInterpolator  # noqa: F401
