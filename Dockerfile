# TPU-VM deployment container — the TPU-native counterpart of the
# reference's CUDA devcontainer (/root/reference/Dockerfile: nvcr pytorch
# base + cu113 wheels + requirements). Run ON a Cloud TPU VM; the TPU chips
# are host devices, so the container needs them mapped (see
# docker-compose.yml — the analogue of the reference's `runtime: nvidia`).
#
# NB: built/tested on a TPU VM with network access; this repo's CI container
# is zero-egress, so the image build itself cannot run there.

FROM python:3.11-slim

ENV DEBIAN_FRONTEND=noninteractive \
    PIP_NO_CACHE_DIR=1

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential git \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

# libtpu-pinned jax first (the reference pins torch cu113 the same way)
RUN pip install -U pip setuptools \
    && pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY pyproject.toml README.md ./
COPY medical_image_editing_tpu ./medical_image_editing_tpu
COPY native ./native
COPY configs ./configs
COPY run_vqwnet.py run_recon.py run_export.py bench.py bench_edit.py ./

RUN pip install . \
    && make -C native || true  # optional C++ host loader; pure-python fallback

# persistent XLA compile cache across container restarts
ENV JAX_COMPILATION_CACHE_DIR=/cache/xla
VOLUME ["/cache", "/data"]

ENTRYPOINT ["python"]
CMD ["run_vqwnet.py", "--help"]
