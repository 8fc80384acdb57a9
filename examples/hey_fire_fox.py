"""Canonical client usage (ref: examples/hey_fire_fox.py).

Usage:
    HOWL_MODELS_PATH=/path/to/howl-models python -m examples.hey_fire_fox
"""

from howl_tpu.client import HowlClient


def hello_callback(detected_words):
    print(f"Detected: {detected_words}")


if __name__ == "__main__":
    client = HowlClient()
    client.from_pretrained("hey_fire_fox")
    client.add_listener(hello_callback)
    client.start().join()
