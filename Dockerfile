# m3d — TPU-native 3D Mask R-CNN (reference ships a GPU TF2.2 image;
# this is the Cloud-TPU equivalent: jax[tpu] on a TPU VM base).
#
# Build:  docker build -t m3d .
# Run  :  docker run --privileged --network=host -v $PWD/data:/work/data m3d \
#           python main.py --task RPN_TRAINING --config_path configs/rpn/scp_rpn_config.json
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /work
COPY pyproject.toml ./
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy scipy pillow h5py pandas pytest

COPY m3d ./m3d
COPY configs ./configs
COPY scripts ./scripts
COPY main.py bench.py ./

# Build the native host runtime (multithreaded IoU/NMS/TIFF IO).
RUN g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
        m3d/native/src/m3d_native.cpp -o m3d/native/libm3d_native.so

ENV PYTHONPATH=/work
CMD ["python", "main.py", "--help"]
