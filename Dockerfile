# blah2_tpu — TPU-native passive radar processor.
#
# Single image for the whole stack: the radar runtime, REST API and web
# console run in one process (python -m blah2_tpu.runtime.cli). The
# reference splits these across three containers (docker-compose.yml:8-43
# there); here the API/web layers are in-process, so one service suffices.
#
# For TPU hosts, swap the jax[cpu] wheel for the libtpu-enabled jax build
# of your pod image; the code paths are identical.

FROM python:3.12-slim AS base

RUN apt-get update && apt-get install -y --no-install-recommends \
      g++ make curl \
  && apt-get clean -y && rm -rf /var/lib/apt/lists/*

WORKDIR /blah2_tpu

# Python deps: jax (CPU by default), numpy, yaml.
RUN pip install --no-cache-dir "jax[cpu]" numpy pyyaml

# Source + native host runtime.
COPY blah2_tpu blah2_tpu
COPY native native
COPY web web
COPY config config
RUN make -C native

EXPOSE 3000 3001 3002 3003 4000 4001 4002

ENTRYPOINT ["python", "-m", "blah2_tpu.runtime.cli"]
CMD ["-c", "config/config.yml"]
