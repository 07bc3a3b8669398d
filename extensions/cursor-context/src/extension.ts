// Cursor/VS Code workspace-context reporter.
//
// Keeps a small JSON cache of the open workspace roots and the active
// file up to date so the dictation app's @file expansion can resolve the
// active workspace (consumed by spittle_tpu/app/context_providers.py;
// reference counterpart: /root/reference/extensions/cursor-context).
//
// Cross-platform cache location matches context_providers.cache_dir():
//   macOS:  ~/Library/Caches/spittle/cursor_context.json
//   Linux:  $XDG_CACHE_HOME/spittle (default ~/.cache/spittle)
//   Windows: %LOCALAPPDATA%\spittle

import * as vscode from "vscode";
import * as fs from "fs";
import * as os from "os";
import * as path from "path";

function cacheDir(): string {
  const home = os.homedir();
  switch (process.platform) {
    case "darwin":
      return path.join(home, "Library", "Caches", "spittle");
    case "win32":
      return path.join(
        process.env.LOCALAPPDATA ?? path.join(home, "AppData", "Local"),
        "spittle",
      );
    default: {
      const xdg = process.env.XDG_CACHE_HOME ?? path.join(home, ".cache");
      return path.join(xdg, "spittle");
    }
  }
}

const contextFile = () => path.join(cacheDir(), "cursor_context.json");

function snapshotAndWrite(): void {
  const roots =
    vscode.workspace.workspaceFolders?.map((folder) => folder.uri.fsPath) ??
    [];
  const active = vscode.window.activeTextEditor?.document.uri.fsPath ?? null;
  const payload = JSON.stringify(
    { workspaceRoots: roots, activeFile: active },
    null,
    2,
  );
  try {
    fs.mkdirSync(cacheDir(), { recursive: true });
    fs.writeFileSync(contextFile(), payload);
  } catch {
    // cache writes are best-effort; dictation falls back to recent roots
  }
}

export function activate(ctx: vscode.ExtensionContext): void {
  snapshotAndWrite();
  ctx.subscriptions.push(
    vscode.workspace.onDidChangeWorkspaceFolders(snapshotAndWrite),
    vscode.window.onDidChangeActiveTextEditor(snapshotAndWrite),
  );
}

export function deactivate(): void {
  try {
    fs.unlinkSync(contextFile());
  } catch {
    // already gone
  }
}
