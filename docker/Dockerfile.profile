# DeepCAM-TPU profiling image (capability parity with the reference's
# docker/Dockerfile.profile.public: profiling driver + trace tooling).
FROM python:3.12-slim

RUN pip install --no-cache-dir \
    "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    flax optax numpy h5py matplotlib \
    tensorboard-plugin-profile  # xprof trace viewer

COPY . /opt/deepcam-tpu
RUN pip install --no-cache-dir -e /opt/deepcam-tpu

WORKDIR /opt/deepcam-tpu
ENTRYPOINT ["python", "-m", "deepcam_tpu.cli.profile"]
