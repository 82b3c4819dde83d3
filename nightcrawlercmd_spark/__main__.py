"""``python -m nightcrawlercmd_spark <subcommand> -flags`` — the
reference binary's dispatch surface (/root/reference/main.go)."""

from .cli import main

if __name__ == "__main__":
    main()
