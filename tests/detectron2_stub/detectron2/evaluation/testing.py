def flatten_results_dict(results):
    """d2 semantics: nested dicts flatten to 'outer/inner' keys."""
    out = {}
    for k, v in results.items():
        if isinstance(v, dict):
            for kk, vv in flatten_results_dict(v).items():
                out[f"{k}/{kk}"] = vv
        else:
            out[k] = v
    return out
