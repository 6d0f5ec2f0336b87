"""cmd: denoise (reference: src/cmd/audio_denoise.py)."""
from . import run_task


def main(params: dict):
    from ..service.audio import AudioService

    service = AudioService(params["source_dir"], params["output_dir"])
    return service.denoise()


if __name__ == "__main__":
    run_task(main)
