from blah2_tpu.net.socket import JsonTcpSender  # noqa: F401
from blah2_tpu.net.api import ApiServer  # noqa: F401
