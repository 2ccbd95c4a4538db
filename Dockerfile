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

ENTRYPOINT ["topaz"]
