"""CLI entry point (placeholder; full train/eval dispatch lands with the
training harness — reference contract: /root/reference/entry.py)."""


def main():
    print("molkgnn-tpu CLI: training harness not wired yet")


if __name__ == "__main__":
    main()
