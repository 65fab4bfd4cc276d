/* Auth state handling (reference: static/js/auth.js): checks
 * /api/auth/status, renders user chip, wires login/logout with redirect-loop
 * guards, clears per-user localStorage on logout. */
"use strict";

const Auth = {
  authenticated: false,
  user: null,

  async checkStatus() {
    try {
      const resp = await fetch("/api/auth/status");
      const data = await resp.json();
      this.authenticated = !!data.authenticated;
      this.user = data.user || null;
    } catch (e) {
      this.authenticated = false;
      this.user = null;
    }
    this.render();
    document.dispatchEvent(
      new CustomEvent("auth:changed", { detail: { authenticated: this.authenticated, user: this.user } })
    );
    return this.authenticated;
  },

  render() {
    const name = document.getElementById("user-name");
    const avatar = document.getElementById("user-avatar");
    const loginBtn = document.getElementById("login-btn");
    const logoutBtn = document.getElementById("logout-btn");
    if (!name) return; // not on the main page
    if (this.authenticated && this.user) {
      name.textContent = this.user.name || this.user.email || this.user.id;
      name.classList.remove("hidden");
      if (this.user.picture) {
        avatar.src = this.user.picture;
        avatar.onerror = () => avatar.classList.add("hidden"); // CORS fallback
        avatar.classList.remove("hidden");
      }
      logoutBtn.classList.remove("hidden");
      loginBtn.classList.add("hidden");
    } else {
      name.classList.add("hidden");
      avatar.classList.add("hidden");
      logoutBtn.classList.add("hidden");
      loginBtn.classList.remove("hidden");
    }
  },

  async logout() {
    try { await fetch("/api/auth/logout", { method: "POST" }); } catch (e) { /* best effort */ }
    // purge THIS user's task history only — stores are deliberately keyed
    // per user (aptpu_tasks_<uid>), and a shared browser must not lose
    // other accounts' 30-day histories on someone else's logout
    const uid = (this.user && this.user.id) || "anon";
    const mine = [`aptpu_tasks_${uid}`, "aptpu_tasks_anon"];
    const doomed = [];
    for (let i = 0; i < localStorage.length; i++) {
      const key = localStorage.key(i);
      if (key && mine.includes(key)) doomed.push(key);
    }
    doomed.forEach((k) => localStorage.removeItem(k));
    this.authenticated = false;
    this.user = null;
    if (!location.pathname.startsWith("/login")) location.href = "/login";
  },

  init() {
    const loginBtn = document.getElementById("login-btn");
    const logoutBtn = document.getElementById("logout-btn");
    if (loginBtn) loginBtn.onclick = () => { location.href = "/api/auth/google"; };
    if (logoutBtn) logoutBtn.onclick = () => this.logout();
    this.checkStatus();
  },
};

document.addEventListener("DOMContentLoaded", () => Auth.init());
