# simplex_tpu web service (the reference's dockerfile role: python-slim,
# non-root user, production WSGI server on :5000).
FROM python:3.12-slim

ENV TZ=UTC \
    PYTHONUNBUFFERED=1 \
    JAX_PLATFORMS=cpu

RUN apt-get update && apt-get install -y --no-install-recommends g++ \
    && rm -rf /var/lib/apt/lists/*

RUN useradd --create-home appuser
WORKDIR /home/appuser/app

COPY pyproject.toml ./
COPY simplex_tpu ./simplex_tpu
COPY web_app.py bench.py ./

RUN pip install --no-cache-dir . gunicorn scipy

RUN chown -R appuser:appuser /home/appuser
USER appuser

EXPOSE 5000
CMD ["gunicorn", "--workers", "2", "--bind", "0.0.0.0:5000", "web_app:app"]
