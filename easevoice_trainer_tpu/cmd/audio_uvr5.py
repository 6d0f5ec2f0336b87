"""cmd: UVR5 vocal separation (reference: src/cmd/audio_uvr5.py)."""
from . import run_task


def main(params: dict):
    from ..service.audio import AudioService

    service = AudioService(params["source_dir"], params["output_dir"])
    return service.uvr5(model_name=params.get("model_name",
                                              "HP5_only_main_vocal"),
                        audio_format=params.get("audio_format", "wav"))


if __name__ == "__main__":
    run_task(main)
