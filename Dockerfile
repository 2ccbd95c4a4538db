# topaz-tpu container (TPU-VM base; the reference ships a CUDA Dockerfile —
# here the accelerator stack is JAX/libtpu)
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends gcc \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/topaz-tpu
COPY pyproject.toml README.md ./
COPY topaz_tpu ./topaz_tpu
COPY scripts ./scripts
COPY relion_run_topaz ./relion_run_topaz

# On a TPU VM install the matching libtpu wheel instead:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir .

# Pre-seed the persistent compile cache so the FIRST micrograph of an
# acquisition run is served at steady-state latency. Compiled programs
# are keyed by backend+topology, so this must run on the deployment
# accelerator: at image build time it only helps CPU-backend deploys;
# on TPU pods run it once at pod start (or bake it in a second build
# stage executed on a TPU VM):
#   topaz warmup -m resnet16_u32 --denoise-model unet \
#     --shapes 4096x4096,5760x4092 --batch-sizes 1,8 -s 8
ARG WARMUP_SHAPES=""
RUN if [ -n "$WARMUP_SHAPES" ]; then \
      topaz warmup -m resnet16_u32 --denoise-model unet \
        --shapes "$WARMUP_SHAPES" --batch-sizes 1,8 -s 8; \
    fi

ENTRYPOINT ["topaz"]
