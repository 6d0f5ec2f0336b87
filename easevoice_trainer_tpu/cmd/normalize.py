"""cmd: dataset normalization (reference: src/cmd/normalize.py)."""
from . import run_task


def main(params: dict):
    from ..service.normalize import NormalizeService

    processing = params.get("processing_path") or params.get("output_dir", "")
    service = NormalizeService(
        processing, params.get("predefined_output_path", ""))
    return service.run()


if __name__ == "__main__":
    run_task(main)
