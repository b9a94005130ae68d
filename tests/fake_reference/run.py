"""Shim of reference run.py: parseMetaPrompt only (reference run.py:81-91).
register_custom_loss / ToLeftOf are intentionally ABSENT so the hasattr
guard in reference_trace.py takes its skip branch."""


def parseMetaPrompt(config):
    # minimal clean-prompt derivation: strip "[token:...]" down to "token"
    # (the real grammar lives in utils/helpers.parse_prompt; reference_trace
    # only needs config.prompt populated)
    out = []
    for word in config.meta_prompt.split():
        if word.startswith("["):
            word = word.lstrip("[").split(":", 1)[0]
        out.append(word.rstrip("]"))
    config.prompt = " ".join(out)
    config.token_dict = {}
