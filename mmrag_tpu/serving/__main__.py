"""CLI entrypoint: ``python -m mmrag_tpu.serving --host 0.0.0.0 --port 8000``.

Role of the reference's uvicorn launcher (``/root/reference/main.py:14-21``);
HOST/PORT env vars honored the same way.
"""

import argparse
import logging
import os


def main() -> None:
    parser = argparse.ArgumentParser(description="mmrag-tpu API server")
    parser.add_argument("--host", default=os.environ.get("HOST", "0.0.0.0"))
    parser.add_argument("--port", type=int, default=int(os.environ.get("PORT", "8000")))
    parser.add_argument("--log-level", default=os.environ.get("LOG_LEVEL", "INFO"))
    parser.add_argument(
        "--platform", default=os.environ.get("MMRAG_PLATFORM", ""),
        help="force a jax platform (e.g. cpu); needed because the container "
        "sitecustomize overrides JAX_PLATFORMS",
    )
    args = parser.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    logging.basicConfig(
        level=args.log_level.upper(),
        format="%(asctime)s %(levelname)s %(name)s %(message)s",
    )
    from .http import serve_forever

    serve_forever(args.host, args.port)


if __name__ == "__main__":
    main()
