# Demo-server deployment image (counterpart of the reference's
# sam2/backend.Dockerfile + docker-compose.yaml, which containerize the Flask
# demo backend). This image serves the HTTP demo API
# (sam2_opt_tpu/serve/server.py) on a TPU VM host.
#
# Build:  docker build -f serve.Dockerfile -t sam2-opt-tpu-serve .
# Run:    docker run --privileged --net=host \
#             -v /path/to/ckpt:/ckpt sam2-opt-tpu-serve \
#             --variant hiera_l --checkpoint /ckpt/large --port 7263
# (--privileged + host networking is the standard TPU-VM container setup so
# the container can reach the TPU driver; on a CPU host it runs the eager
# path for functional testing.)

FROM python:3.12-slim

# libtpu wheel comes with jax[tpu]; g++ builds the native IO helper.
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make libjpeg62-turbo-dev && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY sam2_opt_tpu ./sam2_opt_tpu
COPY csrc ./csrc

RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .
RUN make -C csrc || echo "native IO build skipped (pure-Python fallback)"

EXPOSE 7263
ENTRYPOINT ["python", "-m", "sam2_opt_tpu.serve.server"]
CMD ["--variant", "hiera_l", "--port", "7263"]
