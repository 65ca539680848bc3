"""WSGI entry point (the reference's ``web_app.py`` role).

Exposes a module-level ``app`` for any WSGI server
(``gunicorn web_app:app``) and a dev-server ``main()`` on 0.0.0.0:5000
— reference: ``/root/reference/web_app.py:25,28-35``.
"""
from simplex_tpu.web.app import init_app

app = init_app()


def main():
    from simplex_tpu.web.microweb import run_dev_server
    run_dev_server(app, host="0.0.0.0", port=5000)


if __name__ == "__main__":
    main()
