# hyperpose-tpu container image (reference analog: Dockerfile — the
# reference bakes a CUDA10/TensorRT7/OpenCV image; ours targets a Cloud TPU
# VM, where the TPU runtime comes from the host's libtpu and the image only
# needs the JAX stack).
#
#   docker build -t hyperpose-tpu .
#   # on a TPU VM:
#   docker run --privileged --net=host -v /dev:/dev hyperpose-tpu \
#       python -m hyperpose_tpu.cli --source vid.mp4 --runtime stream \
#       --saving_prefix out
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ libgl1 libglib2.0-0 ffmpeg && \
    rm -rf /var/lib/apt/lists/*

# jax[tpu] resolves libtpu on Cloud TPU VMs; on other machines it falls back
# to CPU (the whole framework runs there too — that is the CI configuration).
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy \
        opencv-python-headless pycocotools

WORKDIR /hyperpose-tpu
COPY hyperpose_tpu/ hyperpose_tpu/
COPY scripts/ scripts/
COPY examples/ examples/
COPY *.py README.md pyproject.toml ./

# Pre-build the native runtime library so first run does not need a compile.
RUN g++ -O3 -std=c++17 -shared -fPIC \
        -o hyperpose_tpu/runtime/native/libhp_runtime.so \
        hyperpose_tpu/runtime/native/hp_runtime.cpp -lpthread

ENTRYPOINT ["python"]
CMD ["-m", "hyperpose_tpu.cli", "--help"]
