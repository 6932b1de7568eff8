#!/usr/bin/env python3
"""Build the static HTML documentation site into docs/_site/.

The reference ships a sphinx site (/root/reference/docs/source/,
deploy_docs_action.sh); this environment has no sphinx/docutils, so the
site builds from what IS here: a dependency-free markdown subset
converter for the guide pages (README, DESIGN) and nbconvert for the
executed notebook gallery.  Usage:

    python docs/build_site.py          # -> docs/_site/index.html
"""

import html
import os
import re
import sys

HERE = os.path.dirname(os.path.realpath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "_site")

PAGES = [
    ("index", os.path.join(ROOT, "README.md"), "Overview"),
    ("design", os.path.join(HERE, "DESIGN.md"), "Design"),
    ("survey", os.path.join(ROOT, "SURVEY.md"), "Reference survey"),
    ("baseline", os.path.join(ROOT, "BASELINE.md"), "Baselines"),
]

STYLE = """
body { max-width: 58em; margin: 2em auto; padding: 0 1em;
       font: 16px/1.55 system-ui, sans-serif; color: #222; }
nav { border-bottom: 1px solid #ddd; padding-bottom: .6em;
      margin-bottom: 1.5em; }
nav a { margin-right: 1.2em; text-decoration: none; color: #0b5394;
        font-weight: 600; }
pre { background: #f6f8fa; padding: .8em; overflow-x: auto;
      border-radius: 6px; font-size: 85%; }
code { background: #f6f8fa; padding: .1em .3em; border-radius: 4px;
       font-size: 90%; }
pre code { padding: 0; background: none; }
table { border-collapse: collapse; margin: 1em 0; display: block;
        overflow-x: auto; }
th, td { border: 1px solid #ccc; padding: .3em .6em; font-size: 90%; }
h1, h2, h3 { line-height: 1.25; }
h2 { border-bottom: 1px solid #eee; padding-bottom: .2em; }
blockquote { color: #555; border-left: 4px solid #ddd;
             margin-left: 0; padding-left: 1em; }
"""


def md_to_html(text):
    """A small markdown-subset renderer (headers, fenced code, lists,
    tables, links, emphasis, inline code) -- enough for these docs."""
    out = []
    lines = text.split("\n")
    i = 0
    in_list = False
    in_para = False

    def close_para():
        nonlocal in_para, in_list
        if in_para:
            out.append("</p>")
            in_para = False
        if in_list:
            out.append("</ul>")
            in_list = False

    def inline(s):
        s = html.escape(s, quote=False)
        s = re.sub(r"`([^`]+)`", r"<code>\1</code>", s)
        s = re.sub(r"\*\*([^*]+)\*\*", r"<b>\1</b>", s)
        s = re.sub(r"\[([^\]]+)\]\(([^)]+)\)", r'<a href="\2">\1</a>', s)
        return s

    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            close_para()
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            out.append("<pre><code>" +
                       html.escape("\n".join(block)) + "</code></pre>")
            i += 1
            continue
        m = re.match(r"^(#{1,4})\s+(.*)", line)
        if m:
            close_para()
            n = len(m.group(1))
            out.append(f"<h{n}>{inline(m.group(2))}</h{n}>")
            i += 1
            continue
        if line.startswith("|"):
            close_para()
            rows = []
            while i < len(lines) and lines[i].startswith("|"):
                rows.append(lines[i])
                i += 1
            out.append("<table>")
            for ri, row in enumerate(rows):
                if re.match(r"^\|[\s\-:|]+\|?$", row):
                    continue
                tag = "th" if ri == 0 else "td"
                cells = [c.strip() for c in row.strip("|").split("|")]
                out.append("<tr>" + "".join(
                    f"<{tag}>{inline(c)}</{tag}>" for c in cells) + "</tr>")
            out.append("</table>")
            continue
        m = re.match(r"^[-*]\s+(.*)", line)
        if m:
            if in_para:
                out.append("</p>")
                in_para = False
            if not in_list:
                out.append("<ul>")
                in_list = True
            item = [m.group(1)]
            i += 1
            while i < len(lines) and re.match(r"^\s{2,}\S", lines[i]):
                item.append(lines[i].strip())
                i += 1
            out.append("<li>" + inline(" ".join(item)) + "</li>")
            continue
        if not line.strip():
            close_para()
            i += 1
            continue
        if not in_para:
            close_para()
            out.append("<p>")
            in_para = True
        out.append(inline(line))
        i += 1
    close_para()
    return "\n".join(out)


def page(title, nav, body):
    return (f"<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>pyro2_tpu — {html.escape(title)}</title>"
            f"<style>{STYLE}</style></head><body>{nav}{body}</body></html>")


def main():
    os.makedirs(OUT, exist_ok=True)

    nb_dir = os.path.join(HERE, "notebooks")
    notebooks = sorted(f for f in os.listdir(nb_dir)
                       if f.endswith(".ipynb"))

    nav_items = [(name + ".html", label) for name, _, label in PAGES]
    nav_items.append(("notebooks.html", "Notebooks"))
    nav = "<nav>" + "".join(
        f"<a href='{href}'>{html.escape(label)}</a>"
        for href, label in nav_items) + "</nav>"

    for name, path, label in PAGES:
        with open(path) as f:
            body = md_to_html(f.read())
        with open(os.path.join(OUT, name + ".html"), "w") as f:
            f.write(page(label, nav, body))
        print(f"built {name}.html from {os.path.relpath(path, ROOT)}")

    # notebook gallery via nbconvert (the notebooks are pre-executed by
    # the docs test tier)
    from nbconvert import HTMLExporter
    exporter = HTMLExporter()
    items = []
    for nb in notebooks:
        base = os.path.splitext(nb)[0]
        try:
            html_body, _ = exporter.from_filename(
                os.path.join(nb_dir, nb))
        except Exception as e:
            print(f"  skipping {nb}: {e}", file=sys.stderr)
            continue
        with open(os.path.join(OUT, base + ".html"), "w") as f:
            f.write(html_body)
        items.append(f"<li><a href='{base}.html'>{base}</a></li>")
        print(f"built {base}.html")

    with open(os.path.join(OUT, "notebooks.html"), "w") as f:
        f.write(page("Notebooks", nav,
                     "<h1>Executed notebooks</h1><ul>" +
                     "".join(items) + "</ul>"))
    print(f"site -> {OUT}")


if __name__ == "__main__":
    main()
