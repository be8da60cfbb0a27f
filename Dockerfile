# voicecraft-tpu serving image (counterpart of the reference's Dockerfile /
# cog.yaml, which target CUDA+conda; this one targets Cloud TPU VMs).
#
#   docker build -t voicecraft-tpu .
#   docker run --privileged --net=host \
#     -v /path/to/ckpts:/ckpts voicecraft-tpu \
#     python serve_cli.py --model /ckpts/giga830M.pth \
#       --codec /ckpts/encodec_4cb2048_giga.th --port 8080
#
# --privileged + host networking are the standard TPU-VM container knobs
# (the libtpu driver needs /dev/accel*).  For a CPU smoke container drop
# them and add --platform cpu to the serve command.

FROM python:3.11-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        espeak-ng ffmpeg g++ && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app

# dependency layer first for build caching; constraints.txt pins the
# known-good set the test/bench matrix ran on
COPY pyproject.toml constraints.txt ./
RUN pip install --no-cache-dir -c constraints.txt \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html && \
    pip install --no-cache-dir -c constraints.txt \
        numpy optax orbax-checkpoint phonemizer

COPY . .
RUN pip install --no-cache-dir --no-deps -e .

EXPOSE 8080
CMD ["python", "serve_cli.py", "--help"]
