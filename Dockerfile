# mmrag-tpu serving image (role of /root/reference/Dockerfile).
# Base image must provide jax with the TPU runtime for the target platform
# (e.g. a Cloud TPU VM base); this layer adds only the app.
FROM python:3.12-slim

WORKDIR /app
COPY mmrag_tpu/ mmrag_tpu/
COPY bench.py __graft_entry__.py .env.example ./

# jax[tpu], optax, orbax-checkpoint, numpy, pillow, opencv-python-headless
# are expected from the base image or a mounted environment; the app itself
# is stdlib + jax only on the serve path.
ENV HOST=0.0.0.0 PORT=8000
EXPOSE 8000
CMD ["python", "-m", "mmrag_tpu.serving"]
